"""Tensor-parallel sharding rules for the AST/ViT encoder stack.

Megatron-style partitioning expressed as GSPMD shardings over the mesh's
``model`` axis (no manual collectives — XLA inserts the all-reduces over
ICI):

- attention q/k/v projections: output (head) dim sharded;
- attention output projection: input dim sharded (row-parallel);
- MLP fc1 column-parallel, fc2 row-parallel;
- everything else (layernorms, embeddings, classifier) replicated.

Applied by placement: ``device_put`` the param tree with these shardings and
jit the train step — sharding propagation does the rest. The models are
small enough that TP is optional for EAV (SURVEY.md §2.3), but the plumbing
is first-class and exercised by the driver's multi-chip dryrun.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eav_tpu.core.optim import path_str
from eav_tpu.parallel.mesh import MODEL_AXIS

_RULES = (
    # fused qkv DenseGeneral: kernel (in, 3, hidden) — shard the head dim
    (r"attn/qkv/kernel$", P(None, None, MODEL_AXIS)),
    (r"attn/qkv/bias$", P(None, MODEL_AXIS)),
    (r"attn/out/kernel$", P(MODEL_AXIS, None)),
    (r"fc1/kernel$", P(None, MODEL_AXIS)),
    (r"fc1/bias$", P(MODEL_AXIS)),
    (r"fc2/kernel$", P(MODEL_AXIS, None)),
)


def tp_spec(path: str) -> P:
    for rx, spec in _RULES:
        if re.search(rx, path):
            return spec
    return P()


def tp_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching ``params`` for encoder TP."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: NamedSharding(mesh, tp_spec(path_str(path))), params
    )


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(params, tp_shardings(params, mesh))
