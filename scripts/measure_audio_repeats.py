"""Repeat-measure the warm AST audio subject protocol on the real chip.

The dev-tunnel runtime has large run-to-run variance (round 3: vision fit
median 116 s vs min 53.8 s on identical work; round 4 saw warm audio 202 s
then 96 s in consecutive invocations), so single warm numbers are not
conclusive. This script runs ONE process, warms every program on subject 1,
then times N repeats of the full warm per-subject protocol through the
production `ModalityPipelines.run_audio` path and prints each wall plus the
median — the robust per-subject number for RUNBOOK tables.

Usage: python scripts/measure_audio_repeats.py [--reps 4]
A/B the chunk-dispatch pipelining with EAV_TPU_FENCE_CHUNKS=1 (round-3
per-chunk fencing) vs unset (round-4 queued dispatch).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--epochs-per-call", type=int, default=2)
    ap.add_argument("--epc-target-seconds", type=float, default=45.0)
    ap.add_argument("--out", default="/tmp/audio_repeats")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu", "this measures the TPU path"

    from measure_audio_flagship import make_audio_cache

    from eav_tpu.train.pipeline import ModalityPipelines, default_presets

    presets = default_presets()
    pipelines = ModalityPipelines(
        data_root="/nonexistent",
        cache_dir=os.path.join(args.out, "cache"),
        logits_dir=os.path.join(args.out, "logits"),
        presets=presets,
        epochs_per_call=args.epochs_per_call,
        epc_target_seconds=args.epc_target_seconds or None,
    )
    subjects = list(range(1, args.reps + 2))
    make_audio_cache(pipelines.cache_dir, subjects, presets["audio"].audio)

    t0 = time.perf_counter()
    pipelines.run_audio(subjects[0])  # compile/load every program
    print(json.dumps({"cold_seconds": round(time.perf_counter() - t0, 1)}), flush=True)

    walls, fits = [], []
    for s in subjects[1:]:
        t0 = time.perf_counter()
        r = pipelines.run_audio(s)
        walls.append(round(time.perf_counter() - t0, 1))
        fits.append(r.metrics["fit_seconds"])
        print(json.dumps({"warm_wall_s": walls[-1], "fit_s": fits[-1],
                          "samples_per_sec": r.metrics["samples_per_sec"]}), flush=True)
    med = float(np.median(walls))
    print(json.dumps({
        "metric": "ast_subject_protocol_median",
        "fence_chunks": os.environ.get("EAV_TPU_FENCE_CHUNKS", "0"),
        "warm_walls_s": walls,
        "median_warm_s": med,
        "median_fit_s": float(np.median(fits)),
        "serial_42_min": round(42 * med / 60.0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
