"""Flash attention (blockwise online-softmax) as a Pallas TPU kernel.

The AST/ViT encoders spend their FLOPs in self-attention over 1214 / 197
tokens (SURVEY.md §3.1). The XLA einsum path materializes (B, H, T, T)
probabilities in HBM; this kernel computes attention block-by-block in VMEM
with the online-softmax recurrence, never materializing the score matrix —
the standard flash-attention memory/bandwidth win, and the clean seam for
longer contexts (SURVEY.md §5 long-context row).

Forward is the Pallas kernel; backward (custom VJP) recomputes attention
with plain XLA einsums — simple and correct; a Pallas backward is a later
optimization. Sequence lengths are padded to the 128-lane block size with
masked keys. Tests run the kernel in interpreter mode on CPU against the
einsum reference; on TPU it compiles to Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK_Q = 128
BLK_K = 128
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int, scale: float):
    """One (batch*head, q-block) program: iterate key blocks, online softmax.

    Shapes: q_ref (1, BLK_Q, D); k_ref/v_ref (1, T_pad, D); o_ref (1, BLK_Q, D).
    """
    _, t_pad, d = k_ref.shape
    q = q_ref[0] * scale

    def body(kb, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(kb * BLK_K, BLK_K), :]
        v_blk = v_ref[0, pl.ds(kb * BLK_K, BLK_K), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # (BLK_Q, BLK_K)
        # mask keys beyond the real sequence length
        key_idx = kb * BLK_K + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_idx < t_real, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    nk = t_pad // BLK_K
    acc0 = jnp.zeros((BLK_Q, d), jnp.float32)
    m0 = jnp.full((BLK_Q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BLK_Q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_forward(q, k, v, interpret: bool):
    """q, k, v: (B, T, H, D) -> (B, T, H, D)."""
    b, t, h, d = q.shape
    scale = 1.0 / np.sqrt(d)
    t_pad = -(-t // BLK_Q) * BLK_Q
    # (B, T, H, D) -> (B*H, T_pad, D)
    def to_bh(x):
        x = _pad_to(x, t_pad, axis=1)
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t_pad, d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    grid = (b * h, t_pad // BLK_Q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, t_real=t, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLK_Q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, t_pad, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, t_pad, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLK_Q, d), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)
    out = out.reshape(b, h, t_pad, d)[:, :, :t, :]
    return jnp.transpose(out, (0, 2, 1, 3))


def _reference_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(q.dtype)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, interpret: bool | None = None):
    """Multi-head attention, (B, T, H, D) layout. Pallas forward; XLA
    recompute backward."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _flash_forward(q, k, v, interpret)


def _fwd(q, k, v, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _flash_forward(q, k, v, interpret), (q, k, v)


def _bwd(interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
