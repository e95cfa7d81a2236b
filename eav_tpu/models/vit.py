"""ViT image classifier in Flax — the flagship vision model.

Architecture parity with HF ``ViTForImageClassification`` (the reference
fine-tunes the `facial_emotions_image_detection` ViT-base checkpoint,
`Transformer_Vision.py:28-30`): 224x224x3 -> 16x16 patches stride 16 -> 196
tokens + [CLS] + learned position embeddings, pre-LN encoder, final LN,
classifier = Dense on the CLS token (swapped to 5 classes by the reference).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from eav_tpu.models.transformer import PatchProj, TransformerEncoder


class ViT(nn.Module):
    num_labels: int = 5
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    image_size: int = 224
    eps: float = 1e-12
    dropout: float = 0.0
    attn_impl: str = "xla"
    compute_dtype: object = None  # e.g. jnp.bfloat16 for MXU throughput
    remat: str = "none"  # 'attn'/'full': rematerialize encoder sublayers
    # dtype of the residual stream through the encoder (None = f32); same
    # semantics as models/ast.py — the head (final_ln onward) stays f32.
    stream_dtype: object = None
    # Fold the ViTImageProcessor recipe (bilinear resize to image_size,
    # rescale 1/255, normalize mean/std 0.5) into the model so the data
    # pipeline can ship raw uint8 frames to the device (4x less transfer
    # than host-preprocessed float32).
    preprocess_uint8: bool = False

    # frozen phases train only the classifier Dense (head_regex; HF keeps
    # final_ln in the backbone, `Transformer_Vision.py:30`) — declares the
    # mode='features'/'head' split for the trainer's frozen-feature cache
    # (train/loop.py); exact because the backbone has no batch stats and the
    # preset dropout is 0.0. head_mode_regex: the trainable set the 'head'
    # graph covers (cache engages only when the trainer's head_regex matches).
    supports_head_mode = True
    head_mode_regex = r"(^|/)(head|classifier(_ln)?)(/|$)"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, mode: str = "full"
    ) -> jnp.ndarray:
        """``x``: (B, H, W, 3) NHWC — processor-normalized floats, or raw
        uint8 frames when ``preprocess_uint8`` (any H, W). ``mode``: 'full' =
        frames -> logits; 'features' = stop at the post-final_ln CLS vector
        (B, hidden); 'head' = ``x`` IS that vector, apply the classifier
        Dense only. full(x) == head(features(x)) by construction."""
        if mode == "head":
            return nn.Dense(self.num_labels, name="classifier")(x)
        b = x.shape[0]
        if self.preprocess_uint8:
            import jax

            x = jnp.asarray(x, jnp.float32)
            if x.shape[1:3] != (self.image_size, self.image_size):
                x = jax.image.resize(
                    x, (b, self.image_size, self.image_size, x.shape[-1]),
                    method="bilinear", antialias=True,
                )
            x = (x / 255.0 - 0.5) / 0.5
        # same param tree as nn.Conv (kernel (P,P,C,hidden) + bias) but the
        # non-overlapping tiling lowers as reshape+one MXU gemm (PatchProj)
        x = PatchProj(
            self.hidden,
            self.patch_size,
            (self.patch_size, self.patch_size),
            name="patch_proj",
        )(x)
        x = x.reshape(b, -1, self.hidden)  # row-major patches == HF flatten
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.hidden), jnp.float32)
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.num_patches + 1, self.hidden),
            jnp.float32,
        )
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1) + pos
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        if self.stream_dtype is not None:
            x = x.astype(self.stream_dtype)
        x = TransformerEncoder(
            self.hidden, self.layers, self.heads, self.mlp_dim, self.eps,
            self.dropout, self.attn_impl, self.compute_dtype, self.remat,
            name="encoder",
        )(x, deterministic=not train)
        x = nn.LayerNorm(epsilon=self.eps, name="final_ln")(x.astype(jnp.float32))
        if mode == "features":
            return x[:, 0]
        return nn.Dense(self.num_labels, name="classifier")(x[:, 0])


def vit_tiny(num_labels: int = 5, **kw) -> ViT:
    defaults = dict(
        num_labels=num_labels, hidden=32, layers=2, heads=2, mlp_dim=64,
        patch_size=16, image_size=64,
    )
    defaults.update(kw)
    return ViT(**defaults)
