"""Measure host->device transfer bandwidth on the tunneled TPU.

Context: the round-3 production-sweep journal shows vision fit_seconds of
90-280 s for ~40 s of pure 3-epoch compute; the difference is the 1.4 GB
uint8 train split's first-touch transfer inside the first step. This pins
the tunnel's actual H2D rate so the RUNBOOK can state how much of the
journaled wall is tunnel artifact (a real TPU host moves this over PCIe at
GB/s) vs framework.
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

assert jax.default_backend() == "tpu", jax.default_backend()

for mb in (16, 64, 256, 1024):
    x = np.random.default_rng(0).integers(0, 256, size=(mb << 20,), dtype=np.uint8)
    # untimed warmup at this size: compiles the d[:1] fence program and
    # exercises the dispatch path so the timed pass is pure transfer
    d = jax.device_put(x)
    np.asarray(d[:1])  # fence (block_until_ready doesn't block on axon)
    del d
    t0 = time.perf_counter()
    d = jax.device_put(x)
    np.asarray(d[:1])
    dt = time.perf_counter() - t0
    print(f"H2D {mb:5d} MB: {dt:6.2f} s = {mb / dt:7.1f} MB/s", flush=True)
    del d
