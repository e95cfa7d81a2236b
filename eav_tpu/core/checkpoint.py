"""Checkpointing via Orbax (+ a plain-npz fallback).

The reference's only persistence is ad-hoc: final ``state_dict`` saves
(`CNN_audio.py:136-142`), per-subject pickles (`Dataload_vision.py:120-132`)
and retained test logits (`Transformer_Audio.py:98-99`). Here any pytree
(TrainResult params/batch_stats, fusion inputs, preprocessed features) can be
saved/restored, keyed by (subject, modality, phase).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree: dict = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_pytree(path: str, tree: Any) -> None:
    """Save a (nested-dict) pytree. Uses Orbax when available, else npz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), jax.tree.map(np.asarray, tree), force=True)
        ckptr.wait_until_finished()
    except Exception:
        np.savez(path + ".npz", **_flatten(tree))


def load_pytree(path: str, template: Optional[Any] = None) -> Any:
    if os.path.exists(path + ".npz"):
        return _unflatten(dict(np.load(path + ".npz")))
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), target=template)
    return ckptr.restore(os.path.abspath(path))
