"""Flash attention (blockwise online-softmax) as Pallas TPU kernels.

The AST/ViT encoders spend their FLOPs in self-attention over 1214 / 197
tokens (SURVEY.md §3.1). The XLA einsum path materializes (B, H, T, T)
probabilities in HBM; these kernels compute attention block-by-block in VMEM
with the online-softmax recurrence, never materializing the score matrix —
the standard flash-attention memory/bandwidth win, and the clean seam for
longer contexts (SURVEY.md §5 long-context row).

Forward emits the per-row logsumexp as a residual; backward is TWO Pallas
kernels (dK/dV accumulated over query blocks, dQ accumulated over key
blocks) using the standard recurrence

    P  = exp(S - lse),  dV = P^T dO,  dP = dO V^T,
    dS = P * (dP - rowsum(dO * O)),  dQ = scale * dS K,  dK = scale * dS^T Q

so training never materializes (T, T) either. At the production 1214-token
AST length the XLA einsum path is still faster on v5e (measured round 1);
the kernel is the long-context seam — see scripts/tpu_microbench.py's
``flash4k`` case for the shape where it wins. Sequence lengths are padded to
the 128-lane block size with masked keys. Tests run the kernels in
interpreter mode on CPU against the einsum reference (values AND grads); on
TPU they compile to Mosaic.
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, t_real: int, scale: float):
    """One (batch*head, q-block) program: iterate key blocks, online softmax.

    Shapes: q_ref (1, BLK_Q, D); k_ref/v_ref (1, T_pad, D); o_ref (1, BLK_Q, D);
    lse_ref (1, BLK_Q) — the per-row logsumexp residual for the backward.
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
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l_safe))[:, 0]


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
    *, t_real: int, scale: float,
):
    """One (batch*head, k-block) program: accumulate dK/dV over all q blocks.

    Shapes: k_ref/v_ref (1, BLK_K, D); q_ref/do_ref (1, T_pad, D);
    lse_ref/di_ref (1, T_pad); dk_ref/dv_ref (1, BLK_K, D).
    """
    _, t_pad, d = q_ref.shape
    kb = pl.program_id(1)
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    key_mask_cols = kb * BLK_K + jax.lax.broadcasted_iota(
        jnp.int32, (BLK_Q, BLK_K), 1
    )

    def body(qi, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(qi * BLK_Q, BLK_Q), :]
        do = do_ref[0, pl.ds(qi * BLK_Q, BLK_Q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qi * BLK_Q, BLK_Q)].reshape(BLK_Q, 1)
        di = di_ref[0, pl.ds(qi * BLK_Q, BLK_Q)].reshape(BLK_Q, 1)
        s = scale * jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        s = jnp.where(key_mask_cols < t_real, s, NEG_INF)
        p = jnp.exp(s - lse)  # (BLK_Q, BLK_K)
        dv_acc = dv_acc + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - di)
        dk_acc = dk_acc + scale * jnp.dot(
            ds.T, q.astype(jnp.float32), preferred_element_type=jnp.float32
        )
        return dk_acc, dv_acc

    nq = t_pad // BLK_Q
    zeros = jnp.zeros((BLK_K, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (zeros, zeros))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref,
    *, t_real: int, scale: float,
):
    """One (batch*head, q-block) program: accumulate dQ over all key blocks.

    Shapes: q_ref/do_ref/dq_ref (1, BLK_Q, D); k_ref/v_ref (1, T_pad, D);
    lse_ref/di_ref (1, BLK_Q).
    """
    _, t_pad, d = k_ref.shape
    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0].reshape(BLK_Q, 1)
    di = di_ref[0].reshape(BLK_Q, 1)

    def body(kb, dq_acc):
        k_blk = k_ref[0, pl.ds(kb * BLK_K, BLK_K), :]
        v_blk = v_ref[0, pl.ds(kb * BLK_K, BLK_K), :]
        s = scale * jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        key_idx = kb * BLK_K + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_idx < t_real, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - di)
        return dq_acc + scale * jnp.dot(
            ds, k_blk.astype(jnp.float32), preferred_element_type=jnp.float32
        )

    nk = t_pad // BLK_K
    dq = jax.lax.fori_loop(0, nk, body, jnp.zeros((BLK_Q, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _to_bh(x, b, h, d, t_pad):
    """(B, T, H, D) -> (B*H, T_pad, D)."""
    x = _pad_to(x, t_pad, axis=1)
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t_pad, d)


def _from_bh(x, b, h, t, d):
    x = x.reshape(b, h, -1, d)[:, :, :t, :]
    return jnp.transpose(x, (0, 2, 1, 3))


def _flash_forward(q, k, v, interpret: bool):
    """q, k, v: (B, T, H, D) -> ((B, T, H, D), lse (B*H, T_pad))."""
    b, t, h, d = q.shape
    scale = float(1.0 / np.sqrt(d))
    t_pad = -(-t // BLK_Q) * BLK_Q
    qb, kb, vb = (_to_bh(x, b, h, d, t_pad) for x in (q, k, v))
    grid = (b * h, t_pad // BLK_Q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, t_real=t, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLK_Q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, t_pad, d), lambda bh, qi: (bh, 0, 0)),
            pl.BlockSpec((1, t_pad, d), lambda bh, qi: (bh, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, BLK_Q, d), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, BLK_Q), lambda bh, qi: (bh, qi)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, t_pad), jnp.float32),
        ),
        interpret=interpret,
    )(qb, kb, vb)
    return _from_bh(out, b, h, t, d), lse


def _flash_backward(q, k, v, o, lse, g, interpret: bool):
    b, t, h, d = q.shape
    scale = float(1.0 / np.sqrt(d))
    t_pad = -(-t // BLK_Q) * BLK_Q
    qb, kb, vb, ob, gb = (_to_bh(x, b, h, d, t_pad) for x in (q, k, v, o, g))
    # di = rowsum(dO * O) — cheap elementwise reduce, stays in XLA
    di = jnp.sum(gb.astype(jnp.float32) * ob.astype(jnp.float32), axis=-1)
    bh = b * h
    nq, nk = t_pad // BLK_Q, t_pad // BLK_K

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, t_real=t, scale=scale),
        grid=(bh, nk),
        in_specs=[
            pl.BlockSpec((1, t_pad, d), lambda bhi, ki: (bhi, 0, 0)),  # q
            pl.BlockSpec((1, BLK_K, d), lambda bhi, ki: (bhi, ki, 0)),  # k
            pl.BlockSpec((1, BLK_K, d), lambda bhi, ki: (bhi, ki, 0)),  # v
            pl.BlockSpec((1, t_pad, d), lambda bhi, ki: (bhi, 0, 0)),  # do
            pl.BlockSpec((1, t_pad), lambda bhi, ki: (bhi, 0)),  # lse
            pl.BlockSpec((1, t_pad), lambda bhi, ki: (bhi, 0)),  # di
        ],
        out_specs=(
            pl.BlockSpec((1, BLK_K, d), lambda bhi, ki: (bhi, ki, 0)),
            pl.BlockSpec((1, BLK_K, d), lambda bhi, ki: (bhi, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), v.dtype),
        ),
        interpret=interpret,
    )(qb, kb, vb, gb, lse, di)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, t_real=t, scale=scale),
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, BLK_Q, d), lambda bhi, qi: (bhi, qi, 0)),  # q
            pl.BlockSpec((1, t_pad, d), lambda bhi, qi: (bhi, 0, 0)),  # k
            pl.BlockSpec((1, t_pad, d), lambda bhi, qi: (bhi, 0, 0)),  # v
            pl.BlockSpec((1, BLK_Q, d), lambda bhi, qi: (bhi, qi, 0)),  # do
            pl.BlockSpec((1, BLK_Q), lambda bhi, qi: (bhi, qi)),  # lse
            pl.BlockSpec((1, BLK_Q), lambda bhi, qi: (bhi, qi)),  # di
        ],
        out_specs=pl.BlockSpec((1, BLK_Q, d), lambda bhi, qi: (bhi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
        interpret=interpret,
    )(qb, kb, vb, gb, lse, di)

    return (
        _from_bh(dq, b, h, t, d),
        _from_bh(dk, b, h, t, d),
        _from_bh(dv, b, h, t, d),
    )


def _reference_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(q.dtype)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, interpret: bool | None = None):
    """Multi-head attention, (B, T, H, D) layout. Pallas forward AND
    backward (flash recurrence in both directions; (T, T) never hits HBM)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _flash_forward(q, k, v, interpret)[0]


def _fwd(q, k, v, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    o, lse = _flash_forward(q, k, v, interpret)
    return o, (q, k, v, o, lse, interpret)


def _bwd(_interpret_static, res, g):
    q, k, v, o, lse, interpret = res
    return _flash_backward(q, k, v, o, lse, g, interpret)


flash_attention.defvjp(_fwd, _bwd)
