"""Shared pre-LN ViT-style transformer encoder (used by AST and ViT).

Semantics match HF's ViT/AST encoder exactly (pre-LayerNorm, GELU MLP,
per-head scaled dot-product attention) so pretrained torch checkpoints map
1:1 onto these modules (models/hf_import.py), reproducing the reference's
`AutoModelFor*Classification.from_pretrained` fine-tunes
(`Transformer_Audio.py:22`, `Transformer_Vision.py:29`).

TPU notes: attention/MLP are plain einsums — XLA fuses and tiles them onto
the MXU; a Pallas flash-attention kernel can be swapped in via
``attn_impl='flash'`` (ops/pallas). For tensor parallelism the head and MLP
dimensions carry logical sharding constraints when a mesh is active
(parallel/mesh.constrain is applied by the caller via
``nn_partitioning``-free explicit annotations — heads are the natural
``model``-axis shard unit).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class PatchProj(nn.Module):
    """Patch embedding with the exact param tree of ``nn.Conv`` (kernel
    (P, P, C, hidden) + bias under this module's name, so HF checkpoint
    import and existing checkpoints are unchanged) but a TPU-friendly
    lowering: XLA lowers the OVERLAPPING 16x16-stride-10 AST patch conv
    poorly (3.44 ms fwd+bwd at bs8 for 3.8 GFLOP), while static-slice patch
    extraction + one (B*N, P*P*C) x (P*P*C, hidden) MXU gemm is bitwise
    identical and 1.55x faster (2.22 ms — scripts/patch_embed_variants.py).
    'auto' picks slices on TPU, conv elsewhere (CPU compiles 100+ slices
    slowly); both paths produce identical values on every backend."""

    hidden: int
    patch_size: int
    strides: tuple  # (row, col)
    impl: str = "auto"  # 'conv' | 'slices' | 'auto'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # NHWC
        p, c = self.patch_size, x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, c, self.hidden),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.hidden,), jnp.float32)
        impl = self.impl
        if impl == "auto":
            impl = "slices" if jax.default_backend() == "tpu" else "conv"
        if impl == "conv":
            y = jax.lax.conv_general_dilated(
                x, kernel, self.strides, "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias
        sr, sc = self.strides
        nr = (x.shape[1] - p) // sr + 1
        nc = (x.shape[2] - p) // sc + 1
        b = x.shape[0]
        if (sr, sc) == (p, p) and x.shape[1] == nr * p and x.shape[2] == nc * p:
            # non-overlapping tiling (ViT 224/16): patch extraction is a pure
            # reshape+transpose — no slicing, no data duplication
            cols = x.reshape(b, nr, p, nc, p, c).transpose(0, 1, 3, 2, 4, 5)
        else:
            rows = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(x, sr * i, p, 1) for i in range(nr)], 1
            )  # (B, nr, P, W, C)
            cols = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(rows, sc * j, p, 3) for j in range(nc)], 2
            )  # (B, nr, nc, P, P, C)
        y = cols.reshape(b, nr * nc, p * p * c) @ kernel.reshape(p * p * c, self.hidden)
        return (y + bias).reshape(b, nr, nc, self.hidden)


class MultiHeadSelfAttention(nn.Module):
    hidden: int
    heads: int
    attn_impl: str = "xla"
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params stay f32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, t, h = x.shape
        d = self.hidden // self.heads
        # Fused q/k/v projection: ONE (h, 3, hidden) gemm instead of three
        # (h, hidden) ones — bigger MXU tiles, one HBM read of x (measured
        # +~8% AST step on v5e). Kernel layout keeps q/k/v as a leading
        # feature axis so TP shards the head dim cleanly (parallel/tp.py);
        # hf_import stacks the HF checkpoint's separate q/k/v weights.
        qkv = nn.DenseGeneral(
            features=(3, self.hidden), name="qkv", dtype=self.dtype
        )(x)
        q = qkv[..., 0, :].reshape(b, t, self.heads, d)
        k = qkv[..., 1, :].reshape(b, t, self.heads, d)
        v = qkv[..., 2, :].reshape(b, t, self.heads, d)
        impl = self.attn_impl
        if impl == "auto":
            # flash wins on TPU at AST length (92.1 vs 104.2 ms/step measured
            # v5e); elsewhere (CPU tests, interpret mode) XLA is the right
            # default. Resolved at trace time — a Python branch, not lax.cond.
            impl = "flash" if jax.default_backend() == "tpu" else "xla"
        if impl == "flash":
            from eav_tpu.ops.pallas.attention import flash_attention

            ctx = flash_attention(q, k, v)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(x.dtype)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        ctx = ctx.reshape(b, t, self.hidden)
        return nn.Dense(self.hidden, name="out", dtype=self.dtype)(ctx)


def _attn_block(mdl: "TransformerLayer", x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
    y = nn.LayerNorm(epsilon=mdl.eps, name="ln1", dtype=mdl.dtype)(x)
    y = MultiHeadSelfAttention(
        mdl.hidden, mdl.heads, mdl.attn_impl, mdl.dtype, name="attn"
    )(y, deterministic)
    return nn.Dropout(mdl.dropout)(y, deterministic=deterministic)


def _mlp_block(mdl: "TransformerLayer", x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
    z = nn.LayerNorm(epsilon=mdl.eps, name="ln2", dtype=mdl.dtype)(x)
    z = nn.Dense(mdl.mlp_dim, name="fc1", dtype=mdl.dtype)(z)
    z = nn.gelu(z, approximate=False)
    z = nn.Dense(mdl.hidden, name="fc2", dtype=mdl.dtype)(z)
    return nn.Dropout(mdl.dropout)(z, deterministic=deterministic)


class TransformerLayer(nn.Module):
    """Pre-LN block. ``remat``: 'none' stores all sublayer residuals;
    'attn' rematerializes the attention sublayer in the backward pass
    (drops the q/k/v/o + out-proj residuals — the ones that OOM a 4-subject
    stacked AST on 16 GB HBM — at the cost of one extra attention forward,
    ~+1/3 of a layer forward); 'full' rematerializes both sublayers
    (activation memory ~= one residual stream per layer, the long-context /
    big-stack setting)."""

    hidden: int
    heads: int
    mlp_dim: int
    eps: float = 1e-12
    dropout: float = 0.0
    attn_impl: str = "xla"
    dtype: object = None
    remat: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # residual stream stays f32; sublayers compute in self.dtype.
        # nn.remat keeps the submodule scope (param names unchanged), so
        # checkpoints import identically whatever the remat mode.
        attn = _attn_block
        mlp = _mlp_block
        if self.remat in ("attn", "full"):
            attn = nn.remat(_attn_block, static_argnums=(2,))
        if self.remat == "full":
            mlp = nn.remat(_mlp_block, static_argnums=(2,))
        x = x + attn(self, x, deterministic).astype(x.dtype)
        return x + mlp(self, x, deterministic).astype(x.dtype)


class TransformerEncoder(nn.Module):
    hidden: int
    layers: int
    heads: int
    mlp_dim: int
    eps: float = 1e-12
    dropout: float = 0.0
    attn_impl: str = "xla"
    dtype: object = None
    remat: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.layers):
            x = TransformerLayer(
                self.hidden,
                self.heads,
                self.mlp_dim,
                self.eps,
                self.dropout,
                self.attn_impl,
                self.dtype,
                self.remat,
                name=f"layer_{i}",
            )(x, deterministic)
        return x
