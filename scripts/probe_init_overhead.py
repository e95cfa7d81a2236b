"""Quantify per-fit() INIT overhead on the tunneled TPU.

Round-3 finding: warm vision fit (105.3 s) carried ~45 s that per-step
arithmetic could not account for (5 unfrozen epochs x 9.6 s + frozen-cache
features ~6 s = ~60 s). Hypothesis: eager dispatch — Flax ``model.init``
executes every initializer op as its own device call, and
``init_adam_state`` issued 2 x n_leaves eager ``zeros`` — hundreds of
round trips through the axon tunnel per subject at ViT-base scale.

This probe measures, at the production vision shape:
  1. eager ``model.init`` (the pre-fix path)
  2. ``jax.jit``-wrapped init: first call (compile) and steady-state
  3. eager per-leaf ``zeros_like`` tree build vs the jitted
     ``init_adam_state``

Usage: python scripts/probe_init_overhead.py
Prints JSON lines; run on the real TPU (asserts non-CPU backend).
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


def fence(tree):
    """block_until_ready is a no-op on axon; np.asarray is the reliable fence
    (pull one small leaf to host)."""
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf.ravel()[:1])
    return tree


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu", "probe measures the TPU path"

    from eav_tpu.core.optim import AdamState, init_adam_state
    from eav_tpu.models.vit import ViT

    model = ViT(preprocess_uint8=True)  # production vision preset model
    x0 = jnp.zeros((1, 224, 224, 3), jnp.uint8)
    key = jax.random.PRNGKey(0)

    # 1. eager init (one throwaway first for any lazy module imports)
    t0 = time.perf_counter()
    v_eager = fence(model.init({"params": key, "dropout": key}, x0, train=False))
    print(json.dumps({"probe": "vit_init_eager_s", "value": round(time.perf_counter() - t0, 2)}), flush=True)

    # 2. jitted init: compile + steady state
    jit_init = jax.jit(lambda k, x: model.init({"params": k, "dropout": k}, x, train=False))
    t0 = time.perf_counter()
    fence(jit_init(key, x0))
    print(json.dumps({"probe": "vit_init_jit_first_s", "value": round(time.perf_counter() - t0, 2)}), flush=True)
    t0 = time.perf_counter()
    v_jit = fence(jit_init(jax.random.PRNGKey(1), x0))
    print(json.dumps({"probe": "vit_init_jit_warm_s", "value": round(time.perf_counter() - t0, 2)}), flush=True)

    params = v_jit["params"]

    # 3. optimizer-state init: eager per-leaf zeros vs jitted program
    t0 = time.perf_counter()
    fence(AdamState(
        count=jax.tree.map(lambda p: jnp.zeros((), jnp.int32), params),
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
    ))
    print(json.dumps({"probe": "adam_init_eager_s", "value": round(time.perf_counter() - t0, 2)}), flush=True)
    t0 = time.perf_counter()
    fence(init_adam_state(params))
    print(json.dumps({"probe": "adam_init_jit_first_s", "value": round(time.perf_counter() - t0, 2)}), flush=True)
    t0 = time.perf_counter()
    fence(init_adam_state(params))
    print(json.dumps({"probe": "adam_init_jit_warm_s", "value": round(time.perf_counter() - t0, 2)}), flush=True)


if __name__ == "__main__":
    main()
