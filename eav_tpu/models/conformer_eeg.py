"""EEG conformer (ShallowConvNet x Transformer hybrid) in Flax.

Behavioral port of `Transformer_torch/Transformer_EEG.py:14-148`, with the
reference's per-filter and per-head Python loops vectorized into einsums
(the reference iterates 40 nn.ModuleList Linears per step, `:29-34`):

- temporal conv Conv2d(1, 40, (1,13)) valid                     (`:118`)
- per-filter spatial projection: 40 independent Linear(30, 1)    (`:24-35`)
  == einsum over a (40, 30) weight -> (B, T=488, 40) tokens
- 12 post-norm transformer layers, embed 40, 1 head, qkv 40,
  attention output keeps a V-residual (out + V, `:70-73`)
- BatchNorm -> square -> AvgPool((1,35), stride (1,7)) -> log-clamp
  power pooling (`:140-142`) -> fc 2600 -> 5, no bias (`:128`)
- post-step fc renorm maxnorm=0.5 (`:196-199`) via maxnorm_rules.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class VResidualAttention(nn.Module):
    """Single-head attention with the reference's V-residual (`:50-73`)."""

    qkv_dim: int = 40

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        q = nn.Dense(self.qkv_dim, use_bias=False, name="wq")(x)
        k = nn.Dense(self.qkv_dim, use_bias=False, name="wk")(x)
        v = nn.Dense(self.qkv_dim, use_bias=False, name="wv")(x)
        scores = jnp.einsum("btd,bsd->bts", q, k) / jnp.sqrt(d).astype(x.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bts,bsd->btd", probs, v)
        return out + v


class PostNormLayer(nn.Module):
    """x = x + drop(norm1(attn(x))); x = x + drop(norm2(ffn(x))) (`:101-104`)."""

    embed: int = 40
    expansion: int = 4
    drop: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        a = VResidualAttention(self.embed, name="attn")(x)
        # eps 1e-5 = torch nn.LayerNorm default (`Transformer_EEG.py:97-98`);
        # flax defaults to 1e-6, a real (if tiny) trajectory divergence
        a = nn.LayerNorm(epsilon=1e-5, name="norm1")(a)
        x = x + nn.Dropout(self.drop)(a, deterministic=deterministic)
        f = nn.Dense(self.embed * self.expansion, name="fc1")(x)
        f = nn.relu(f)
        f = nn.Dropout(self.drop)(f, deterministic=deterministic)
        f = nn.Dense(self.embed, name="fc2")(f)
        f = nn.LayerNorm(epsilon=1e-5, name="norm2")(f)
        return x + nn.Dropout(self.drop)(f, deterministic=deterministic)


class ConformerEEG(nn.Module):
    nb_classes: int = 5
    chans: int = 30
    samples: int = 500
    filters: int = 40
    kern: int = 13
    num_layers: int = 12
    dropout: float = 0.5
    fc_maxnorm: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # (B, chans, samples) -> NHWC (B, chans, samples, 1)
        if x.ndim == 3:
            x = x[..., None]
        x = nn.Conv(
            self.filters, (1, self.kern), padding="VALID", use_bias=False,
            name="conv_temporal",
        )(x)  # (B, chans, T, filters)
        # per-filter spatial projection: (filters, chans) weight
        w = self.param(
            "spatial_proj",
            nn.initializers.lecun_normal(),
            (self.filters, self.chans),
            jnp.float32,
        )
        tokens = jnp.einsum("bcte,ec->bte", x, w)  # (B, T, filters)
        for i in range(self.num_layers):
            tokens = PostNormLayer(
                self.filters, drop=self.dropout, name=f"layer_{i}"
            )(tokens, deterministic=not train)
        # (B, T, F) -> (B, 1, T, F) for BN over the filter axis, then power pool
        h = tokens[:, None, :, :]  # NHWC with C=filters
        # torch-faithful BN (unbiased running-var update, models/norm.py):
        # the running stats feed every per-epoch eval (`Transformer_EEG.py:205-219`)
        from eav_tpu.models.norm import TorchBatchNorm

        h = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(h)
        h = jnp.square(h)
        h = nn.avg_pool(h, (1, 35), strides=(1, 7))  # T=488 -> 65
        h = jnp.log(jnp.clip(h, 1e-7, 1e4))
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = h.reshape((h.shape[0], -1))  # 65 * 40 = 2600 (`:128`)
        return nn.Dense(self.nb_classes, use_bias=False, name="head")(h)

    @property
    def maxnorm_rules(self) -> Tuple[Tuple[str, float, Tuple[int, ...]], ...]:
        return ((r"head/kernel", self.fc_maxnorm, (0,)),)
