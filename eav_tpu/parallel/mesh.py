"""Device mesh construction and sharding helpers.

The reference's only parallelism is single-host ``torch.nn.DataParallel``
(`Transformer_Audio.py:59-60`); there is no distributed backend at all
(SURVEY.md §2.3). The TPU-native replacement is a named-axis
``jax.sharding.Mesh`` with XLA collectives over ICI:

- ``subject`` axis: embarrassingly-parallel per-subject fine-tunes — the main
  scale-out lever for the 42-subject sweep (no gradient communication).
- ``data`` axis: batch sharding within one fine-tune (DP; XLA inserts the
  gradient reduce).
- ``model`` axis: tensor-parallel attention/MLP sharding for the AST/ViT
  encoders (heads/hidden partitioned).

Axes the reference never needed (pp/sp/ep/cp) are expressible by adding named
axes here and annotating with :func:`constrain`; no dedicated schedulers are
built (SURVEY.md §2.3 table).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SUBJECT_AXIS = "subject"


def make_mesh(
    axes: Sequence[Tuple[str, int]] = ((DATA_AXIS, -1),),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh from (axis_name, size) pairs; one size may be -1 to
    absorb the remaining devices (like numpy reshape)."""
    devices = list(devices if devices is not None else jax.devices())
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    n = len(devices)
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis size may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1])) or 1
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total > n:
        raise ValueError(f"mesh of {total} devices > {n} available")
    grid = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(grid, tuple(names))


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain(x, mesh: Mesh, *spec):
    """with_sharding_constraint shorthand, usable inside jit."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def put_sharded(x, mesh: Mesh, *spec):
    return jax.device_put(x, shard(mesh, *spec))
