"""Repeat-measure the warm ViT vision subject protocol on the real chip.

Same methodology as scripts/measure_audio_repeats.py: the dev-tunnel runtime
has large run-to-run variance (round 3's vision journal: fit median 116 s vs
min 53.8 s on identical work), so single warm numbers are not conclusive.
One process warms every program on subject 1, then times N repeats of the
full warm per-subject protocol through the production
`ModalityPipelines.run_vision` path and prints each wall plus the median.

Usage: python scripts/measure_vision_repeats.py [--reps 4] [--ab]
``--ab`` interleaves EAV_TPU_FENCE_CHUNKS 1/0 per repeat (fence arm first so
a pipelined repeat can't leak queued work into the fenced one) — the
in-process interleave cancels tunnel drift between the two arms.
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
    ap.add_argument("--ab", action="store_true",
                    help="alternate EAV_TPU_FENCE_CHUNKS 1/0 per repeat")
    ap.add_argument("--epochs-per-call", type=int, default=2)
    ap.add_argument("--epc-target-seconds", type=float, default=45.0)
    ap.add_argument("--out", default="/tmp/vision_repeats")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu", "this measures the TPU path"

    from measure_vision_flagship import make_vision_cache

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
    make_vision_cache(pipelines.cache_dir, subjects, presets["vision"].vision)

    t0 = time.perf_counter()
    pipelines.run_vision(subjects[0])  # compile/load every program
    print(json.dumps({"cold_seconds": round(time.perf_counter() - t0, 1)}), flush=True)

    walls, fits, fences = [], [], []
    for i, s in enumerate(subjects[1:]):
        if args.ab:
            os.environ["EAV_TPU_FENCE_CHUNKS"] = "1" if i % 2 == 0 else "0"
        fences.append(os.environ.get("EAV_TPU_FENCE_CHUNKS", "0"))
        t0 = time.perf_counter()
        r = pipelines.run_vision(s)
        walls.append(round(time.perf_counter() - t0, 1))
        fits.append(r.metrics["fit_seconds"])
        print(json.dumps({"warm_wall_s": walls[-1], "fit_s": fits[-1],
                          "fence": fences[-1],
                          "samples_per_sec": r.metrics["samples_per_sec"]}), flush=True)
    for arm in sorted(set(fences)):
        aw = [w for w, f in zip(walls, fences) if f == arm]
        af = [x for x, f in zip(fits, fences) if f == arm]
        med = float(np.median(aw))
        print(json.dumps({
            "metric": "vit_subject_protocol_median",
            "fence_chunks": arm,
            "warm_walls_s": aw,
            "median_warm_s": med,
            "median_fit_s": float(np.median(af)),
            "serial_42_min": round(42 * med / 60.0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
