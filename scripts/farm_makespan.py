"""Replay a measured sweep journal through the REAL farm scheduler.

The v5e-8 wall-clock claim needs a schedule, not arithmetic: 42 subjects x
{audio, vision} are independent serial-policy fine-tunes (one saturates a
chip, cli._STACK_CAPS) whose measured walls vary 54-350 s, so "sum / 8" is
only a lower bound — the real number depends on claim order, stragglers and
tail balance. This script builds a per-(subject, modality) duration table
from a committed hardware metrics journal (default: round 3's full 168-task
production sweep, docs/results/sweep_full_metrics.jsonl) and executes
``SweepRunner.run_farmed`` — the exact production scheduler: LPT claim
order, ahead-claim starvation guard, fusion deferral — with N simulated
workers whose task_fn sleeps the measured duration (time-scaled). The
reported makespan is the schedule the farm would actually produce on a
v5e-8 given those measured task walls.

The projection composes like the CLI's `--subject-parallel 8
--chip-parallel 8` path (cli._run_sweep): worker 0 drives the stacked EEG
groups on its chip as farm setup (journal group walls) while workers 1-7
farm the serial-policy tasks, worker 0 joins the claim loop when the
stacked pass finishes, and the serial fusion pass follows.

Usage: python scripts/farm_makespan.py [--workers 8] [--scale 0.02]
                                       [--metrics docs/results/sweep_full_metrics.jsonl]
Pure host-side simulation — no devices touched; safe anywhere.
"""

import argparse
import collections
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_walls(metrics_path):
    """Per-(subject, modality) measured walls, split by scheduling policy.

    Serial-policy rows (group_size absent) carry their own wall_clock_s.
    Stacked rows (group_size set) repeat the GROUP wall per subject; those
    families run stacked on one chip before the farm engages, so they
    contribute sum-of-unique-group-walls, not farm tasks.
    """
    serial = {}
    stacked_group_walls = {}
    fusion_s = 0.0
    for line in open(metrics_path):
        r = json.loads(line)
        if r.get("accuracy") is None or "modality" not in r:
            continue
        key = (r["subject"], r["modality"])
        if r["modality"] == "fusion":
            fusion_s += r["wall_clock_s"]
        elif r.get("group_size"):
            # one entry per distinct stacked-fit program call
            stacked_group_walls[(r["modality"], r["wall_clock_s"])] = r["wall_clock_s"]
        else:
            serial[key] = r["wall_clock_s"]
    return serial, sum(stacked_group_walls.values()), fusion_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--scale", type=float, default=0.02,
                    help="sleep = measured_wall * scale (0.02 -> ~25 s sim)")
    ap.add_argument(
        "--metrics",
        default=os.path.join(REPO, "docs/results/sweep_full_metrics.jsonl"),
    )
    args = ap.parse_args()

    from eav_tpu.core.sweep import SweepConfig, SweepRunner, TaskResult

    serial, stacked_s, fusion_s = load_walls(args.metrics)
    subjects = sorted({s for s, _ in serial})
    modalities = sorted({m for _, m in serial})
    per_mod = collections.defaultdict(float)
    for (s, m), w in serial.items():
        per_mod[m] += w
    serial_total = sum(serial.values())
    print(json.dumps({
        "tasks": len(serial), "subjects": len(subjects),
        "serial_policy_seconds": {m: round(v, 1) for m, v in per_mod.items()},
        "stacked_eeg_seconds": round(stacked_s, 1),
        "fusion_seconds": round(fusion_s, 1),
        "single_chip_total_min": round(
            (serial_total + stacked_s + fusion_s) / 60.0, 1),
    }), flush=True)

    with tempfile.TemporaryDirectory() as td:
        cfg = SweepConfig(
            subjects=tuple(subjects), modalities=tuple(modalities),
            journal_path=os.path.join(td, "journal.jsonl"),
            metrics_path=os.path.join(td, "metrics.jsonl"),
        )

        def task_fn(subject, modality):
            time.sleep(serial[(subject, modality)] * args.scale)
            return TaskResult(metrics={"accuracy": 0.0})

        class W:
            def __init__(self, i, setup_fn=None):
                self.name = f"simdev{i}"
                self.prefetch_fn = None
                self.task_fn = task_fn
                self.setup_fn = setup_fn

        # worker 0 mirrors cli._run_sweep's overlap: it drives the stacked
        # EEG pass on its chip as farm setup, then joins the claim loop —
        # the other workers farm audio/vision from t=0
        workers = [
            W(i, setup_fn=(lambda: time.sleep(stacked_s * args.scale))
              if i == 0 else None)
            for i in range(args.workers)
        ]
        runner = SweepRunner(cfg, task_fn)
        t0 = time.perf_counter()
        state = runner.run_farmed(workers, verbose=False)
        sim_wall = time.perf_counter() - t0
        assert all(r["status"] == "done" for r in state.values())
        summary = [json.loads(l) for l in open(cfg.metrics_path)
                   if "farm_summary" in l][-1]

    farm_s = sim_wall / args.scale
    busy = [b / args.scale for b in summary["busy_s"]]
    # scheduling overhead in the sim is claim-lock + thread wakeups, all
    # host-side and identical in production; sleep granularity adds ~ms/task.
    # The lower bound spreads ALL work (stacked included, since worker 0
    # absorbs it as setup) perfectly over the workers.
    lower_bound = (serial_total + stacked_s) / args.workers
    total = farm_s + fusion_s
    print(json.dumps({
        "metric": "farm_makespan_projection",
        "n_workers": args.workers,
        "farmed_makespan_min": round(farm_s / 60.0, 1),
        "farmed_lower_bound_min": round(lower_bound / 60.0, 1),
        "schedule_efficiency": round(lower_bound / farm_s, 3),
        "per_worker_busy_min": [round(b / 60.0, 1) for b in busy],
        "stacked_eeg_overlapped_min": round(stacked_s / 60.0, 1),
        "fusion_serial_min": round(fusion_s / 60.0, 1),
        "projected_total_min": round(total / 60.0, 1),
        "single_chip_total_min": round(
            (serial_total + stacked_s + fusion_s) / 60.0, 1),
        "speedup": round(
            (serial_total + stacked_s + fusion_s) / total, 2),
    }, ), flush=True)


if __name__ == "__main__":
    main()
