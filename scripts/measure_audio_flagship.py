"""Measure the AST audio flagship END-TO-END on the real TPU with round-3 code.

RUNBOOK carried a round-2 number for one full audio subject protocol (557 s
incl. the two phase compiles, ~95 s steady) while the round-3 production
sweep's journal extrapolation said ~390 min serial for 42 subjects — the two
disagree because the sweep scaled shrunk-epoch rows naively. This script
replaces both with a direct measurement of the round-3 code: one cold + one
warm full per-subject protocol (10 frozen + 15 unfrozen epochs, bs 8,
per-epoch eval, `Dataload_audio.py:110-114` semantics) through the production
`ModalityPipelines.run_audio` path, synthetic fbanks at production shape
(400, 1024, 128) in the npz cache.

Usage: python scripts/measure_audio_flagship.py [--epochs-per-call N]
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


def make_audio_cache(cache_dir: str, subjects, cfg, trials=400):
    from eav_tpu.train.pipeline import _cfg_hash

    os.makedirs(cache_dir, exist_ok=True)
    first = None
    rng = np.random.default_rng(0)
    for s in subjects:
        path = os.path.join(cache_dir, f"s{s:02d}_aud_fbank_{_cfg_hash(cfg)}.npz")
        if os.path.exists(path):
            first = first or path
            continue
        if first is None:
            x = rng.normal(size=(trials, 1024, 128)).astype(np.float32)
            y = np.repeat(np.arange(5), trials // 5).astype(np.int32)
            np.savez(path, x=x, y=y)
            first = path
        else:
            os.link(first, path)
    return first


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs-per-call", type=int, default=2,
                    help="chunked phase programs (the axon tunnel kills "
                    "single executions of more than a couple of minutes)")
    ap.add_argument("--epc-target-seconds", type=float, default=45.0,
                    help="adaptively enlarge chunks to ~this wall per call "
                    "(0 disables; cuts per-call dispatch overhead)")
    ap.add_argument("--out", default="/tmp/audio_flagship")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu", "this measures the TPU path"

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
    make_audio_cache(pipelines.cache_dir, [1, 2], presets["audio"].audio)

    results = {}
    for s, tag in ((1, "cold"), (2, "warm")):
        t0 = time.perf_counter()
        r = pipelines.run_audio(s)
        wall = time.perf_counter() - t0
        results[tag] = {
            "subject_wall_seconds": round(wall, 1),
            "fit_seconds": r.metrics["fit_seconds"],
            "load_seconds": r.metrics["load_seconds"],
            "archive_seconds": r.metrics["archive_seconds"],
            "samples_per_sec": r.metrics["samples_per_sec"],
            "epochs": r.metrics["epochs"],
            "accuracy": r.metrics["accuracy"],
        }
        print(json.dumps({"audio_flagship_" + tag: results[tag]}), flush=True)

    per_subject = results["warm"]["subject_wall_seconds"]
    print(json.dumps({
        "metric": "ast_finetune_subject_protocol",
        "warm_subject_seconds": per_subject,
        "serial_42_subjects_minutes": round(42 * per_subject / 60.0, 1),
        "v5e8_8way_minutes": round(42 * per_subject / 8 / 60.0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
