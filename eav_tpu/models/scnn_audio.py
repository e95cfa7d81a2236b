"""SCNN — the published audio CNN baseline on the 180-d handcrafted feature.

Behavioral port of `CNN_torch/CNN_audio.py:10-37` (torch twin of the Keras
notebook model C14, the source of the published 36.7% audio ACC): four
Conv1d layers over the 180-d feature treated as a length-180 sequence with 1
channel, MaxPool(8) after the second conv, flatten 128*22=2816, linear head.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SCNNAudio(nn.Module):
    num_classes: int = 5
    # (post-conv2, post-conv4) dropout rates, `CNN_audio.py:20,29`. (0, 0)
    # makes training deterministic — the trainer-trajectory parity test
    # zeroes both sides' dropout (cross-framework RNG streams can't match).
    dropout_rates: tuple = (0.1, 0.5)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # (B, 180) -> NWC (B, 180, 1)
        if x.ndim == 2:
            x = x[..., None]
        x = nn.relu(nn.Conv(256, (5,), padding="SAME", name="conv1")(x))
        x = nn.relu(nn.Conv(128, (5,), padding="SAME", name="conv2")(x))
        x = nn.Dropout(self.dropout_rates[0])(x, deterministic=not train)
        x = nn.max_pool(x, (8,), strides=(8,))  # 180 -> 22 (torch floor mode)
        x = nn.relu(nn.Conv(128, (5,), padding="SAME", name="conv3")(x))
        x = nn.relu(nn.Conv(128, (5,), padding="SAME", name="conv4")(x))
        x = nn.Dropout(self.dropout_rates[1])(x, deterministic=not train)
        x = x.reshape((x.shape[0], -1))  # 22 * 128 = 2816 (`CNN_audio.py:32`)
        return nn.Dense(self.num_classes, name="head")(x)
