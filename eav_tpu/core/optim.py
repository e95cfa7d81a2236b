"""Optimizers with torch-faithful freeze/unfreeze semantics.

The reference keeps ONE torch Adam/AdamW across the freeze -> unfreeze phases
(`Transformer_Audio.py:30,45-48`): frozen params have ``requires_grad=False``
so their ``.grad`` is None and torch skips them entirely — no moment update,
no weight decay, and (crucially) their per-parameter step count does not
advance, so bias correction restarts when they unfreeze. optax's global-count
Adam cannot express that, so this is a small custom implementation with a
**per-leaf step count** and a static trainable-mask pytree baked into each
phase's jitted step.

Note on weight decay: the reference constructs ``optim.AdamW(params, lr)``
without passing its own ``weight_decay`` kwarg through
(`Transformer_Audio.py:30`), so torch's default wd=0.01 applies to every
trainable parameter (no layernorm/bias exemption). We replicate that.
"""

from __future__ import annotations

import re
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    count: Any  # per-leaf int32 counts
    mu: Any
    nu: Any


@jax.jit
def init_adam_state(params) -> AdamState:
    # jitted: one compiled program instead of 2 x n_leaves eager zeros
    # dispatches (hundreds of device round trips per fit() through the
    # tunneled runtime at ViT/AST-base scale); jax.jit caches per pytree
    # structure + leaf avals, so each model compiles it once
    zeros_like = lambda p: jnp.zeros_like(p)
    counts = jax.tree.map(lambda p: jnp.zeros((), jnp.int32), params)
    return AdamState(
        count=counts,
        mu=jax.tree.map(zeros_like, params),
        nu=jax.tree.map(zeros_like, params),
    )


def adam_update(
    grads,
    state: AdamState,
    params,
    *,
    lr,
    trainable_mask,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
):
    """One Adam/AdamW step. ``trainable_mask`` is a pytree of static python
    bools (matching ``params``); frozen leaves are returned untouched with
    their state untouched — exactly torch's requires_grad=False behavior.

    ``weight_decay > 0`` gives decoupled AdamW: p <- p - lr*(update + wd*p),
    torch's formulation (p <- p*(1-lr*wd) before the Adam step; equivalent).
    """

    def leaf(p, g, c, m, v, t):
        if not t:
            return p, c, m, v
        c1 = c + 1
        m1 = b1 * m + (1.0 - b1) * g
        v1 = b2 * v + (1.0 - b2) * (g * g)
        c1f = c1.astype(p.dtype)
        mhat = m1 / (1.0 - jnp.asarray(b1, p.dtype) ** c1f)
        vhat = v1 / (1.0 - jnp.asarray(b2, p.dtype) ** c1f)
        step = mhat / (jnp.sqrt(vhat) + eps)
        if weight_decay:
            p1 = p * (1.0 - lr * weight_decay) - lr * step
        else:
            p1 = p - lr * step
        return p1, c1, m1, v1

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_c = treedef.flatten_up_to(state.count)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_t = treedef.flatten_up_to(trainable_mask)
    outs = [
        leaf(p, g, c, m, v, t)
        for p, g, c, m, v, t in zip(flat_p, flat_g, flat_c, flat_m, flat_v, flat_t)
    ]
    new_p = treedef.unflatten([o[0] for o in outs])
    new_state = AdamState(
        count=treedef.unflatten([o[1] for o in outs]),
        mu=treedef.unflatten([o[2] for o in outs]),
        nu=treedef.unflatten([o[3] for o in outs]),
    )
    return new_p, new_state


# -----------------------------------------------------------------------------
# Trainable masks and max-norm projections
# -----------------------------------------------------------------------------


def path_str(path) -> str:
    """'/'-joined readable key path for a pytree leaf."""
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def mask_from_predicate(params, predicate) -> Any:
    """Pytree of python bools: predicate(path_str, leaf) per leaf."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: bool(predicate(path_str(path), p)), params
    )


def trainable_mask(params, freeze: bool, head_regex: str = r"(^|/)(head|classifier(_ln)?)(/|$)"):
    """freeze=True -> only parameters whose path matches ``head_regex`` train
    (reference `Transformer_Audio.py:53-56`); freeze=False -> all train."""
    if not freeze:
        return jax.tree.map(lambda p: True, params)
    rx = re.compile(head_regex)
    return mask_from_predicate(params, lambda path, p: rx.search(path) is not None)


def maxnorm_project(params, rules: Sequence[Tuple[str, float, Tuple[int, ...]]]):
    """Project parameters onto L2 max-norm balls.

    ``rules``: (path_regex, maxnorm, norm_axes). For each matching leaf the L2
    norm is computed over ``norm_axes`` and the leaf rescaled where it exceeds
    ``maxnorm`` — the functional equivalent of torch's in-place
    ``renorm_(p=2, dim=0, maxnorm)`` hooks (`EEGNet_tor.py:33-34,47-48`) and
    post-step clamps (`Transformer_EEG.py:196-199`).
    """
    compiled = [(re.compile(rx), mn, axes) for rx, mn, axes in rules]

    def leaf(path, p):
        s = path_str(path)
        for rx, mn, axes in compiled:
            if rx.search(s):
                norm = jnp.sqrt(jnp.sum(p * p, axis=axes, keepdims=True))
                scale = jnp.minimum(1.0, mn / jnp.maximum(norm, 1e-12))
                p = p * scale
        return p

    return jax.tree_util.tree_map_with_path(leaf, params)
