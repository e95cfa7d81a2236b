"""Tri-modal (EEG + audio + vision) fusion head — new capability.

The reference only *hints* at fusion via a dead import of an unpublished
``Fusion.VIT_audio`` package (`CNN_torch/EEGNet_tor.py:4`); BASELINE.json
requires us to provide it. Design: late fusion over per-trial class scores
from the three per-subject fine-tuned models.

Alignment assumption (documented, since the reference ships nothing): all
three modalities yield 400 aligned 5 s samples per subject in the same
(class-stratified, temporal-order) layout, so after ``EAVDataSplit`` the
k-th train/test row of each modality corresponds to the same interaction.

Two fusers:
- ``mode='weighted'``: per-modality learned temperature + scalar weight on
  log-softmax scores, summed — calibrated late fusion, ~20 params, robust
  for 280-trial training sets.
- ``mode='mlp'``: MLP over concatenated logits for nonlinear interactions.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FusionHead(nn.Module):
    num_classes: int = 5
    num_modalities: int = 3
    mode: str = "weighted"  # 'weighted' | 'mlp'
    hidden: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """``x``: (B, num_modalities, num_classes) raw logits -> (B, classes)."""
        logp = jax.nn.log_softmax(x, axis=-1)
        if self.mode == "weighted":
            log_temp = self.param(
                "log_temp", nn.initializers.zeros, (self.num_modalities, 1), jnp.float32
            )
            weight = self.param(
                "weight", nn.initializers.ones, (self.num_modalities, 1), jnp.float32
            )
            scaled = jax.nn.log_softmax(x / jnp.exp(log_temp), axis=-1)
            fused = (weight * scaled).sum(axis=1)
            bias = self.param("bias", nn.initializers.zeros, (self.num_classes,), jnp.float32)
            return fused + bias
        flat = logp.reshape((x.shape[0], -1))
        h = nn.relu(nn.Dense(self.hidden, name="fc1")(flat))
        h = nn.Dropout(0.3)(h, deterministic=not train)
        return nn.Dense(self.num_classes, name="head")(h)
