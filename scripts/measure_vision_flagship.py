"""Measure the vision flagship END-TO-END on the real TPU (VERDICT r2 #1).

Runs the full per-subject ViT-base protocol at PRODUCTION shape through the
production `ModalityPipelines.run_vision` path (`Transformer_Vision.py:132-188`
semantics): synthetic 400 trials x 25 frames x 224x224x3 uint8 (7,000 train /
3,000 test frames after the h_idx=56 split), bs 128, 10 frozen + 5 unfrozen
epochs, per-epoch eval, uint8-to-device + on-device preprocessing, per-trial
mean-logit vote. Then attempts a 2-subject STACKED run at the same shape to
establish real per-chip group sizing (cli.py's vision group heuristic).

The synthetic frames live in the pipelines' npz cache (pre-populated here, so
no mp4 decode is involved — this measures the TRAIN path, which is the
unmeasured leg; decode/MTCNN are measured separately). Subject 2's cache is a
hardlink to subject 1's bytes.

Usage: python scripts/measure_vision_flagship.py [--skip-stacked] [--epochs-per-call N]
Prints JSON lines with wall-clocks.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np


def make_vision_cache(cache_dir: str, subjects, cfg, trials=400, frames=25, size=224):
    from eav_tpu.train.pipeline import _cfg_hash

    os.makedirs(cache_dir, exist_ok=True)
    first = None
    rng = np.random.default_rng(0)
    for s in subjects:
        path = os.path.join(cache_dir, f"s{s:02d}_vis_{_cfg_hash(cfg)}.npz")
        if os.path.exists(path):
            first = first or path
            continue
        if first is None:
            x = rng.integers(0, 256, size=(trials, frames, size, size, 3), dtype=np.uint8)
            # per-class blocks in order, the eav_split layout
            y = np.repeat(np.arange(5), trials // 5).astype(np.int32)
            np.savez(path, x=x, y=y)
            first = path
        else:
            os.link(first, path)  # same bytes, no extra disk
    return first


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-stacked", action="store_true")
    ap.add_argument("--epochs-per-call", type=int, default=2,
                    help="chunked phase programs (the axon tunnel kills "
                    "single executions of more than a couple of minutes)")
    ap.add_argument("--epc-target-seconds", type=float, default=45.0,
                    help="adaptively enlarge chunks to ~this wall per call "
                    "(0 disables; cuts per-call dispatch overhead)")
    ap.add_argument("--out", default="/tmp/vision_flagship")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu", (
        "this measures the TPU path (axon can crash and silently fall back to CPU)")

    from eav_tpu.train.pipeline import ModalityPipelines, default_presets

    presets = default_presets()
    pipelines = ModalityPipelines(
        data_root="/nonexistent",  # everything comes from the cache
        cache_dir=os.path.join(args.out, "cache"),
        logits_dir=os.path.join(args.out, "logits"),
        presets=presets,
        epochs_per_call=args.epochs_per_call,
        epc_target_seconds=args.epc_target_seconds or None,
    )
    make_vision_cache(
        pipelines.cache_dir, [1, 2], presets["vision"].vision
    )

    results = {}
    # cold subject (includes compiles + transfers), then warm subject — the
    # steady-state per-subject number the 42-subject extrapolation uses
    for s, tag in ((1, "cold"), (2, "warm")):
        t0 = time.perf_counter()
        r = pipelines.run_vision(s)
        wall = time.perf_counter() - t0
        results[tag] = {
            "subject_wall_seconds": round(wall, 1),
            "fit_seconds": r.metrics["fit_seconds"],
            "samples_per_sec": r.metrics["samples_per_sec"],
            "epochs": r.metrics["epochs"],
            "accuracy": r.metrics["accuracy"],
        }
        print(json.dumps({"vision_flagship_" + tag: results[tag]}), flush=True)

    if not args.skip_stacked:
        try:
            t0 = time.perf_counter()
            st = pipelines.run_stacked([1, 2], "vision")
            wall = time.perf_counter() - t0
            results["stacked2"] = {
                "wall_seconds": round(wall, 1),
                "aggregate_samples_per_sec": st[1].metrics["samples_per_sec"],
            }
        except Exception as e:  # RESOURCE_EXHAUSTED is a *finding* here
            results["stacked2"] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps({"vision_stacked2": results["stacked2"]}), flush=True)

    per_subject = results["warm"]["subject_wall_seconds"]
    print(json.dumps({
        "metric": "vit_finetune_subject_protocol",
        "warm_subject_seconds": per_subject,
        "serial_42_subjects_minutes": round(42 * per_subject / 60.0, 1),
        "v5e8_8way_minutes": round(42 * per_subject / 8 / 60.0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
