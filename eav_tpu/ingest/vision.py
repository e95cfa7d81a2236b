"""Vision preprocessing: frames -> ViT pixel values, batched on device.

Replaces the reference's one-image-at-a-time HF processor loop
(`Transformer_Vision.py:52-59`, ~10k PIL round-trips per subject) with one
jit-compiled op over a whole frame batch: bilinear (antialiased) resize to
224, rescale 1/255, normalize mean/std 0.5 — the ViTImageProcessor recipe
used by the `facial_emotions_image_detection` checkpoint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("size",))
def vit_pixel_values(frames: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """(N, H, W, 3) uint8/float -> (N, size, size, 3) float32 normalized."""
    x = jnp.asarray(frames, jnp.float32)
    n, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (n, size, size, c), method="bilinear", antialias=True)
    x = x / 255.0
    return (x - 0.5) / 0.5


def preprocess_frames(frames: np.ndarray, size: int = 224, batch: int = 512) -> np.ndarray:
    """Host-side batching wrapper: (N, H, W, 3) uint8 -> (N, size, size, 3) f32."""
    outs = []
    for i in range(0, len(frames), batch):
        outs.append(np.asarray(vit_pixel_values(jnp.asarray(frames[i : i + batch]), size)))
    return np.concatenate(outs, axis=0)


def flatten_trials_to_frames(x: np.ndarray, y: np.ndarray):
    """(trials, frames, H, W, 3), (trials,) -> per-frame samples with labels
    repeated (reference `Transformer_Vision.py:46-48`)."""
    t, f = x.shape[:2]
    return x.reshape((t * f,) + x.shape[2:]), np.repeat(np.asarray(y), f)
