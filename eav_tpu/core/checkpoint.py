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
    """Save a (nested-dict) pytree. Uses Orbax when available, else npz.

    Only an *unavailable* Orbax (ImportError) falls back to npz; a real Orbax
    failure (e.g. partial write) propagates rather than being masked. A
    successful Orbax save removes any stale npz at the same path so the
    fallback artifact can never shadow a newer checkpoint on load."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        np.savez(path + ".npz", **_flatten(tree))
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.tree.map(np.asarray, tree), force=True)
    ckptr.wait_until_finished()
    if os.path.exists(path + ".npz"):
        os.remove(path + ".npz")


def load_pytree(path: str, template: Optional[Any] = None) -> Any:
    """Load a pytree saved by save_pytree. When both an Orbax directory and an
    npz exist (e.g. written by different environments), the newer one wins."""
    npz = path + ".npz" if os.path.exists(path + ".npz") else None
    orbax_dir = path if os.path.isdir(path) else None
    if npz and orbax_dir:
        if os.path.getmtime(npz) >= os.path.getmtime(orbax_dir):
            orbax_dir = None
        else:
            npz = None
    if npz:
        return _unflatten(dict(np.load(npz)))
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), target=template)
    return ckptr.restore(os.path.abspath(path))
