"""Isolate the frozen-cache vision regression: time each piece of the cached
fit path at production shape on the real chip (features extraction, one
head-phase chunk, one full-phase chunk), fenced with np.asarray.

Usage: python scripts/probe_frozen_cache.py
"""

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


def t(tag, fn, *a, reps=1, **kw):
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*a, **kw)
    # fence: np.asarray of one leaf (block_until_ready is a no-op on axon)
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"probe": tag, "seconds": round(dt, 3)}), flush=True)
    return out, dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu"

    from eav_tpu.train.pipeline import build_model, default_presets
    from eav_tpu.core.optim import init_adam_state, trainable_mask

    preset = default_presets()["vision"]
    model, kw = build_model(preset)
    from eav_tpu.train.loop import JitTrainer

    trainer = JitTrainer(model, preset.finetune, epochs_per_call=2, **kw)

    rng = np.random.default_rng(0)
    n_tr, n_te = 7000, 3000
    tr_f = rng.integers(0, 256, size=(n_tr, 224, 224, 3), dtype=np.uint8)
    te_f = rng.integers(0, 256, size=(n_te, 224, 224, 3), dtype=np.uint8)
    tr_y = (np.arange(n_tr) % 5).astype(np.int32)
    te_y = (np.arange(n_te) % 5).astype(np.int32)

    t0 = time.perf_counter()
    tr_d = jnp.asarray(tr_f)
    te_d = jnp.asarray(te_f)
    np.asarray(tr_d[0, 0, 0])
    np.asarray(te_d[0, 0, 0])
    print(json.dumps({"probe": "h2d_uint8_1.35GB", "seconds": round(time.perf_counter() - t0, 3)}), flush=True)

    k = jax.random.PRNGKey(0)
    variables = model.init({"params": k, "dropout": k}, tr_d[:1], train=False)
    params = variables["params"]

    # --- features extraction (the new heavy program) ---
    (px, _) = t("features_7000_cold_or_cached", trainer.extract_features, params, {}, tr_d)
    t("features_7000_warm", trainer.extract_features, params, {}, tr_d)
    (pe, _) = t("features_3000", trainer.extract_features, params, {}, te_d)

    px = jnp.asarray(px)
    pe = jnp.asarray(pe)
    tr_yd = jnp.asarray(tr_y)
    te_yd = jnp.asarray(te_y)
    lr = jnp.asarray(5e-4, jnp.float32)

    def fresh():
        # phase programs donate params/opt_state — every call needs live copies
        p = jax.tree.map(jnp.array, params)
        return p, init_adam_state(p)

    # --- one 2-epoch HEAD phase chunk ---
    mask = trainable_mask(params, True, trainer.head_regex)
    head_fn = trainer._build_phase(mask, 2, n_tr, n_te, head=True)
    p, o = fresh()
    out, _ = t("head_phase_2ep_cold_or_cached", head_fn, p, {}, o, jax.random.PRNGKey(1),
               px, tr_yd, pe, te_yd, lr)
    t("head_phase_2ep_warm", head_fn, out[0], {}, out[2], out[3], px, tr_yd, pe, te_yd, lr)

    # --- one 2-epoch FULL phase chunk (the old frozen-phase cost) ---
    mask_f = trainable_mask(params, False, trainer.head_regex)
    full_fn = trainer._build_phase(mask_f, 2, n_tr, n_te, head=False)
    p, o = fresh()
    out, _ = t("full_phase_2ep_cold_or_cached", full_fn, p, {}, o,
               jax.random.PRNGKey(2), tr_d, tr_yd, te_d, te_yd, lr)
    t("full_phase_2ep_warm", full_fn, out[0], {}, out[2], out[3], tr_d, tr_yd, te_d, te_yd, lr)


if __name__ == "__main__":
    main()
