"""Test harness: force an 8-virtual-device CPU platform.

Multi-chip TPU hardware is not available in CI; all mesh/sharding tests run on
`xla_force_host_platform_device_count=8` CPU devices, per the framework's
distributed test strategy (SURVEY.md §4). Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (registered from sitecustomize at interpreter startup)
# force-updates jax_platforms to "axon,cpu", overriding the env var — undo it.
if "axon" in (jax.config.jax_platforms or ""):
    jax.config.update("jax_platforms", "cpu")

# Golden-parity tests compare against float64 scipy/HF oracles; production
# code requests float32 explicitly.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
