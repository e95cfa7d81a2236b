"""One journaled 42x3(+fusion) sweep through the PRODUCTION CLI on hardware
(VERDICT r2 #2 — the reference's actual operating mode,
`Dataload_audio.py:80-115`, is its `__main__` sweep; ours is
`python -m eav_tpu.cli run`).

Synthetic subjects at REAL shapes, pre-populated into the pipelines' feature
cache (EEG (400,30,500) f32, AST fbank (400,1024,128) f32, vision
(400,25,224,224,3) uint8; subjects 2..42 hardlink subject 1's bytes so disk
stays ~1.8 GB), then the real CLI subprocess with `--subject-parallel 8` and
journal/metrics/logit archiving — followed by a fusion pass over the archived
logits, same out dir.

Epoch counts are shrunk via --set (and ONLY via --set, the production
override mechanism) because full-epoch audio alone is ~6.5 h single-chip:
  audio  10+15 -> 1+2   (x8.33 epochs)
  vision 10+5  -> 2+1   (x5 epochs)
  eeg    200 (full — measured 17 min stacked-8 in round 2)
The printed extrapolation scales the journaled per-epoch times back to full
protocol; the JSONL pair under --out is the deliverable.

Usage: python scripts/run_production_sweep.py [--subjects 1-42] [--out DIR]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np


def _labels(n=400):
    return np.repeat(np.arange(5), n // 5).astype(np.int32)


def build_caches(cache_dir: str, subjects):
    from eav_tpu.train.pipeline import _cfg_hash, default_presets

    presets = default_presets()
    os.makedirs(cache_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    specs = {
        "eeg": (
            f"_eeg_{_cfg_hash(presets['eeg'].eeg)}",
            lambda: rng.normal(size=(400, 30, 500)).astype(np.float32),
        ),
        "aud": (
            f"_aud_fbank_{_cfg_hash(presets['audio'].audio)}",
            lambda: rng.normal(size=(400, 1024, 128)).astype(np.float32),
        ),
        "vis": (
            f"_vis_{_cfg_hash(presets['vision'].vision)}",
            lambda: rng.integers(0, 256, size=(400, 25, 224, 224, 3), dtype=np.uint8),
        ),
    }
    for _, (suffix, gen) in specs.items():
        first = None
        for s in subjects:
            path = os.path.join(cache_dir, f"s{s:02d}{suffix}.npz")
            if os.path.exists(path):
                first = first or path
                continue
            if first is None:
                np.savez(path, x=gen(), y=_labels())
                first = path
            else:
                os.link(first, path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", default="1-42")
    ap.add_argument("--out", default="/tmp/sweep_prod")
    ap.add_argument("--subject-parallel", type=int, default=8)
    ap.add_argument("--chip-parallel", type=int, default=0,
                    help="farm the serial-policy tasks over N device-bound "
                    "workers (cli --chip-parallel); 0 = serial. On the "
                    "1-chip dev tunnel only N=1 (farm-of-one smoke) runs; "
                    "on a real v5e-8 use 8.")
    ap.add_argument("--skip-fusion", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="run the FULL published protocols (no epoch shrink) "
                    "— ~3.5 h single-chip with the round-3 frozen-feature "
                    "cache + device-resident splits")
    ap.add_argument("--watchdog-minutes", type=float, default=15.0,
                    help="restart the CLI subprocess (journal-resume) when "
                    "metrics.jsonl stops advancing for this long — the axon "
                    "worker stalls spontaneously on multi-hour runs "
                    "(observed twice 2026-08-18: a device call hangs forever "
                    "mid-subject). 0 disables. Default 15: a restart landing "
                    "when only fusion remains appends no metrics until the "
                    "fusion prewarm compile finishes (~680 s cold, journaled "
                    "2026-08-20), and a 12-min window left ~40 s for startup "
                    "— a mid-compile kill would loop forever since nothing "
                    "lands in the persistent cache.")
    args = ap.parse_args()

    out = args.out
    cache = os.path.join(out, "cache")
    subs = []
    for part in args.subjects.split(","):
        if "-" in part:
            a, b = part.split("-")
            subs.extend(range(int(a), int(b) + 1))
        else:
            subs.append(int(part))
    build_caches(cache, subs)

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    common = [
        sys.executable, "-m", "eav_tpu.cli", "run",
        "--data-root", os.path.join(out, "nonexistent-data-root"),  # cache-hit only
        "--subjects", args.subjects,
        "--out", out, "--cache-dir", cache,
        "--epochs-per-call", "2",  # axon tunnel kills multi-minute executions
        # adaptively enlarge chunks to ~45 s/call: at 2 epochs/call a
        # 200-epoch EEGNet group pays 100 dispatch round trips (~0.4-0.7 s
        # each through the tunnel) — ~40% of the leg
        "--epc-target-seconds", "45",
    ]
    shrink = [] if args.full else [
        "--set", "audio.finetune.phases.0.epochs=1",
        "--set", "audio.finetune.phases.1.epochs=2",
        "--set", "vision.finetune.phases.0.epochs=2",
        "--set", "vision.finetune.phases.1.epochs=1",
    ]
    def call_watched(cmd):
        """subprocess.call with a stall watchdog: if the sweep's metrics
        JSONL stops advancing for --watchdog-minutes, kill the subprocess
        and relaunch it — the journal resumes past all done tasks. Returns
        the final return code."""
        metrics = os.path.join(out, "metrics.jsonl")
        limit = args.watchdog_minutes * 60.0
        while True:
            launched = time.time()
            p = subprocess.Popen(cmd, cwd=REPO, env=env)
            rc = None
            while rc is None:
                try:
                    rc = p.wait(timeout=30.0)
                except subprocess.TimeoutExpired:
                    if not limit:
                        continue
                    try:
                        age = time.time() - os.path.getmtime(metrics)
                    except OSError:
                        age = 0.0  # no metrics yet: compiling/loading
                    # both clauses: give a fresh launch its compile window
                    if age > limit and time.time() - launched > limit:
                        print(json.dumps({"watchdog_restart": {
                            "stalled_minutes": round(age / 60, 1)}}), flush=True)
                        p.kill()
                        p.wait()
                        break
            if rc is not None:
                return rc

    t0 = time.perf_counter()
    farm = (["--chip-parallel", str(args.chip_parallel)]
            if args.chip_parallel else [])
    # fusion runs IN THE SAME process as its producer legs (pending-task
    # order puts it last; cli spawns the fusion-prewarm thread at sweep
    # start) so its ~11-min XLA compile overlaps the hours of training
    # instead of serializing after them — a separate fusion process pays
    # the compile cold (680 s journaled 2026-08-20; even warm persistent
    # cache replays cost 412 s through the remote-compile tunnel). The
    # watchdog tolerates the fusion wait: a post-restart prewarm compile
    # (~11.3 min, the only time metrics can stall on it) stays inside the
    # 15-min default window (see --watchdog-minutes).
    mods = "eeg,audio,vision" if args.skip_fusion else "eeg,audio,vision,fusion"
    rc = call_watched(
        common + ["--modalities", mods,
                  "--subject-parallel", str(args.subject_parallel)]
        + farm + shrink,
    )
    main_wall = time.perf_counter() - t0
    print(json.dumps({"sweep_main_rc": rc, "wall_minutes": round(main_wall / 60, 1)}),
          flush=True)
    if rc != 0:
        sys.exit(rc)

    # per-modality wall-clock split + full-protocol extrapolation FROM THE
    # JOURNAL (fit_seconds per task; epochs scaled back to production counts)
    per_mod = {}
    with open(os.path.join(out, "metrics.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            m = row.get("modality")
            fs = row.get("fit_seconds")
            if m is None or fs is None:
                continue
            d = per_mod.setdefault(m, {"fit_seconds": 0.0, "epochs": row.get("epochs"),
                                       "n": 0, "group_sizes": set(),
                                       "load_seconds": 0.0, "archive_seconds": 0.0})
            # stacked rows repeat the group's shared fit_seconds per subject
            g = row.get("group_size") or 1
            d["fit_seconds"] += fs / g
            d["load_seconds"] += (row.get("load_seconds") or 0.0) / g
            d["archive_seconds"] += row.get("archive_seconds") or 0.0
            d["n"] += 1
            d["group_sizes"].add(g)
    full_epochs = {"eeg": 200, "audio": 25, "vision": 15, "fusion": 100}
    report = {}
    for m, d in per_mod.items():
        scale = full_epochs.get(m, d["epochs"]) / max(d["epochs"], 1)
        report[m] = {
            "measured_minutes": round(d["fit_seconds"] / 60, 1),
            "epochs_ran": d["epochs"],
            "full_protocol_minutes_est": round(d["fit_seconds"] * scale / 60, 1),
            "subjects": d["n"],
            "group_sizes": sorted(d["group_sizes"]),
            "load_minutes": round(d["load_seconds"] / 60, 1),
            "archive_minutes": round(d["archive_seconds"] / 60, 1),
        }
    print(json.dumps({"sweep_journal_summary": report}, indent=2), flush=True)


if __name__ == "__main__":
    main()
