"""Profiling/observability helpers."""

import numpy as np
import jax
import jax.numpy as jnp

from eav_tpu.utils.profiling import Throughput, debug_nans, fence


def test_throughput_meter():
    m = Throughput()
    with m.measure(n_samples=50):
        x = jnp.arange(50.0) * 2
        fence(x)
    assert m.samples_per_sec > 0
    assert m.wall_clock_s > 0


def test_fence_handles_pytrees_and_empty():
    fence({"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}})
    fence({})  # no leaves: no-op
    fence([np.ones(2)])


def test_debug_nans_toggle():
    before = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before
