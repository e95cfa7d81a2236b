"""AST (Audio Spectrogram Transformer) in Flax — the flagship audio model.

Architecture parity with HF ``ASTForAudioClassification`` (the model the
reference fine-tunes, `Transformer_Audio.py:22-24`; hyper-params from
`Pre_trained_models/ast-finetuned-audioset/config.json`: hidden 768, 12
layers, 12 heads, intermediate 3072, patch 16, freq/time stride 10,
spectrogram 1024x128):

- input (B, 1024 frames, 128 mels) -> (freq, time) plane -> 16x16 patches at
  stride (10, 10) -> 12*101 = 1212 patch tokens;
- [CLS] + [distill] tokens + learned position embeddings (1214 tokens);
- pre-LN encoder; pooled = (h[CLS] + h[distill]) / 2;
- MLP head = LayerNorm + Dense (the reference swaps only the Dense for a
  5-way layer, keeping the pretrained LayerNorm, `Transformer_Audio.py:24`).

Pretrained weights import via models/hf_import.py; random init otherwise
(weights are not vendored in the reference either, C17).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from eav_tpu.models.transformer import PatchProj, TransformerEncoder


class AST(nn.Module):
    num_labels: int = 5
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    frequency_stride: int = 10
    time_stride: int = 10
    num_mel_bins: int = 128
    max_frames: int = 1024
    eps: float = 1e-12
    dropout: float = 0.0
    attn_impl: str = "xla"
    compute_dtype: object = None  # e.g. jnp.bfloat16 for MXU throughput
    remat: str = "none"  # 'attn' drops attention residuals (stacked fits)
    # dtype of the residual stream through the encoder (None = f32). bf16
    # halves the HBM traffic of every layer's residual read/write — measured
    # -0.95 ms/layer fwd+bwd at bs8 (scripts/ast_component_times.py); the
    # head (final_ln onward) always computes in f32. Parity tests pin the
    # f32 default; the TPU preset opts in via model_kwargs.
    stream_dtype: object = None

    # the frozen fine-tune phase trains only classifier_ln + classifier
    # (head_regex, `Transformer_Audio.py:53-56`), so the trainer can compute
    # the pooled backbone features ONCE and replay the frozen epochs on them
    # (train/loop.py frozen-feature cache) — this flag declares the
    # mode='features'/'head' split below exists and is exact (no dropout at
    # rate 0, no batch stats anywhere in the backbone). head_mode_regex is
    # the trainable set the 'head' graph covers; the trainer only engages
    # the cache when its head_regex matches exactly.
    supports_head_mode = True
    head_mode_regex = r"(^|/)(head|classifier(_ln)?)(/|$)"

    @property
    def num_patches(self) -> int:
        f = (self.num_mel_bins - self.patch_size) // self.frequency_stride + 1
        t = (self.max_frames - self.patch_size) // self.time_stride + 1
        return f * t

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, mode: str = "full"
    ) -> jnp.ndarray:
        """``mode``: 'full' = spectrogram -> logits; 'features' = stop at the
        pooled (B, hidden) backbone output (everything the frozen phase never
        updates); 'head' = ``x`` IS that pooled tensor, apply classifier_ln +
        classifier only. full(x) == head(features(x)) by construction."""
        if mode == "head":
            h = nn.LayerNorm(epsilon=self.eps, name="classifier_ln")(x)
            return nn.Dense(self.num_labels, name="classifier")(h)
        b = x.shape[0]
        # (B, frames, mels) -> (B, mels[freq-H], frames[time-W], 1): matches
        # HF's unsqueeze(1).transpose(2,3) NCHW conv in NHWC form.
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        x = PatchProj(
            self.hidden,
            self.patch_size,
            (self.frequency_stride, self.time_stride),
            name="patch_proj",
        )(x)
        # (B, 12, 101, H) -> (B, 1212, H); freq-major ordering == HF flatten(2)
        x = x.reshape(b, -1, self.hidden)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.hidden), jnp.float32)
        dist = self.param("dist_token", nn.initializers.zeros, (1, 1, self.hidden), jnp.float32)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.num_patches + 2, self.hidden),
            jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.tile(cls, (b, 1, 1)), jnp.tile(dist, (b, 1, 1)), x], axis=1
        )
        x = x + pos
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        if self.stream_dtype is not None:
            x = x.astype(self.stream_dtype)
        x = TransformerEncoder(
            self.hidden, self.layers, self.heads, self.mlp_dim, self.eps,
            self.dropout, self.attn_impl, self.compute_dtype, self.remat,
            name="encoder",
        )(x, deterministic=not train)
        x = nn.LayerNorm(epsilon=self.eps, name="final_ln")(x.astype(jnp.float32))
        pooled = (x[:, 0] + x[:, 1]) / 2.0
        if mode == "features":
            return pooled
        h = nn.LayerNorm(epsilon=self.eps, name="classifier_ln")(pooled)
        return nn.Dense(self.num_labels, name="classifier")(h)


def ast_tiny(num_labels: int = 5, **kw) -> AST:
    """Small config for tests/dryruns."""
    defaults = dict(
        num_labels=num_labels, hidden=32, layers=2, heads=2, mlp_dim=64,
        patch_size=16, frequency_stride=10, time_stride=10,
        num_mel_bins=128, max_frames=128,
    )
    defaults.update(kw)
    return AST(**defaults)
