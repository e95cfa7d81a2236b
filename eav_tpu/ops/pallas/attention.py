"""Flash attention (blockwise online-softmax) as Pallas TPU kernels.

The AST/ViT encoders spend their FLOPs in self-attention over 1214 / 197
tokens (SURVEY.md §3.1). The XLA einsum path materializes (B, H, T, T)
probabilities in HBM; these kernels compute attention block-by-block in VMEM
with the online-softmax recurrence, never materializing the score matrix —
the standard flash-attention memory/bandwidth win, and the clean seam for
longer contexts (SURVEY.md §5 long-context row).

Kernel structure (the streaming form): each kernel runs on a 3-D grid
(batch*head, outer-block, inner-block) with the *inner* dimension iterating
fastest, so Pallas streams one (BLK, D) tile of the long operand per grid
step (double-buffered DMA overlapped with compute) while the softmax /
gradient recurrence accumulates in VMEM scratch. VMEM use is O(BLK * D)
regardless of sequence length — a naive whole-row BlockSpec OOMs scoped VMEM
at T=16k. Forward emits per-row logsumexp as a (BH, T, 1) residual (trailing
singleton so block last-two dims satisfy Mosaic's (8, 128)-or-full-dim tiling
rule); backward is TWO kernels (dK/dV accumulated over query blocks, dQ over
key blocks) using

    P  = exp(S - lse),  dV = P^T dO,  dP = dO V^T,
    dS = P * (dP - rowsum(dO * O)),  dQ = scale * dS K,  dK = scale * dS^T Q

so training never materializes (T, T) either. All matmuls keep operands in
their input dtype (bf16 hits the fast MXU path) with f32 accumulation; the
softmax state stays f32.

Measured on v5e (scripts/tpu_microbench.py ``flash4k [--long]``, fwd+bwd
train step wall-clock, round 2): T=4096 bf16 1.44x XLA / f32 2.31x;
T=8192 bf16 1.51x; T=16384 bf16 1.54x; T=32768+ flash runs (80 ms at 32k,
162 ms at 64k) where the XLA path OOMs 16 GB HBM. At the production AST
length (1214 -> 1280 tokens) the kernel wins too once the block matches the
padded length (640x640: 5.38 vs 5.62 ms/layer; +13% full-train-step), so
the AST preset defaults to it on TPU via ``attn_impl='auto'``
(models/transformer.py); ViT's 197 tokens stay on XLA attention. Sequence
lengths are padded to the block size with masked keys.
Tests run the kernels in interpreter mode on CPU against the einsum
reference (values AND grads); on TPU they compile to Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pick_blocks(t: int):
    """(block_q, block_k, t_pad): the largest K-block candidate that
    minimizes the padded length — big blocks amortize per-grid-step overhead
    (at 128x128 the Mosaic grid dominated wall-clock), small ones avoid
    padding waste on short sequences. 640 is there for the AST length
    (1214 -> 1280 = 2x640), where it puts the kernel ahead of XLA. The
    Q-block (the *pinned* operand in the fwd/dq kernels, the streamed one in
    dkv) is doubled when the padded length allows — fewer, bigger programs
    measured faster at the production shape."""
    candidates = (640, 512, 256, 128)
    pads = {c: -(-t // c) * c for c in candidates}
    best = min(pads.values())
    for c in candidates:  # prefer the largest block among minimal pads
        if pads[c] == best:
            bq = 2 * c if best % (2 * c) == 0 else c
            return bq, c, best
    raise AssertionError("unreachable: best is always one candidate's pad")


def _flash_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
    *, scale: float, nk: int,
):
    """Grid (BH, nq, nk), nk fastest. Blocks: q/o (1, BLK_Q, D) pinned per
    (bh, qi); k/v (1, BLK_K, D) streamed per ki; scratch acc/m/l carry the
    online-softmax state across ki steps. Padded keys are masked by ONE
    broadcast add of a precomputed (1, BLK_K) 0/-inf bias row — an
    iota+compare+select here costs three full VPU passes over the score
    tile instead (the kernels are VPU-bound at head dim 64)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    s = scale * jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLK_Q, BLK_K) — bf16 operands hit the fast MXU path, f32 accumulate
    s = s + bias_ref[...]  # (1, BLK_K) broadcast over rows
    m_prev, l_prev = m_ref[...], l_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_ref[...] = m_new
    l_ref[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _flush():
        l_safe = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = m_ref[...] + jnp.log(l_safe)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, bias_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale: float, nq: int,
):
    """Grid (BH, nk, nq), nq fastest. k/v (1, BLK_K, D) pinned per (bh, ki);
    q/do/lse/di streamed per qi; scratch dk/dv accumulate over q blocks.
    Padded keys masked by the shared (1, BLK_K) bias row (see _flash_kernel);
    exp(s - 1e30 - lse) is exactly 0.0 so padded dk/dv rows stay zero."""
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    di = di_ref[0]
    s = scale * jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BLK_Q, BLK_K)
    s = s + bias_ref[...]
    p = jnp.exp(s - lse)
    pc = p.astype(do.dtype)  # bf16 operand for the MXU; f32 accumulate
    dv_acc[...] = dv_acc[...] + jax.lax.dot_general(
        pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - di)).astype(q.dtype)
    dk_acc[...] = dk_acc[...] + scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, bias_ref, dq_ref, dq_acc,
    *, scale: float, nk: int,
):
    """Grid (BH, nq, nk), nk fastest. q/do/lse/di (BLK_Q rows) pinned per
    (bh, qi); k/v streamed per ki; scratch dq accumulates over key blocks."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    di = di_ref[0]
    s = scale * jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_ref[...]
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - di)).astype(q.dtype)
    dq_acc[...] = dq_acc[...] + scale * jax.lax.dot(
        ds, k_ref[0], preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _flush():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


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


def _key_bias(t: int, t_pad: int):
    """(1, t_pad) f32 row: 0 for real keys, -1e30 for padding. Computed once
    in XLA; each kernel grid step adds its (1, BLK_K) block to the score
    tile — exp(s - 1e30 - lse) is exactly 0.0, so masking semantics are
    identical to the old iota+compare+select at a third of the VPU passes."""
    return jnp.where(
        jnp.arange(t_pad, dtype=jnp.int32) < t, 0.0, NEG_INF
    ).astype(jnp.float32)[None, :]


def _flash_forward_bh(qb, kb, vb, t: int, interpret: bool):
    """Core forward on already-(B*H, T_pad, D) operands; returns (o, lse)
    in the same layout. ``t`` = real (unpadded) sequence length."""
    bh, t_pad, d = qb.shape
    scale = float(1.0 / np.sqrt(d))
    bq, bk, t_pad2 = _pick_blocks(t)
    assert t_pad2 == t_pad, (t_pad2, t_pad)
    nq, nk = t_pad // bq, t_pad // bk
    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk=nk),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bhi, qi, ki: (bhi, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda bhi, qi, ki: (bhi, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda bhi, qi, ki: (bhi, ki, 0)),
            pl.BlockSpec((1, bk), lambda bhi, qi, ki: (0, ki)),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda bhi, qi, ki: (bhi, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda bhi, qi, ki: (bhi, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t_pad, d), qb.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb, _key_bias(t, t_pad))


def _flash_forward(q, k, v, interpret: bool):
    """q, k, v: (B, T, H, D) -> ((B, T, H, D), lse (B*H, T_pad, 1))."""
    b, t, h, d = q.shape
    _, _, t_pad = _pick_blocks(t)
    qb, kb, vb = (_to_bh(x, b, h, d, t_pad) for x in (q, k, v))
    out, lse = _flash_forward_bh(qb, kb, vb, t, interpret)
    return _from_bh(out, b, h, t, d), lse


def _flash_backward_bh(qb, kb, vb, ob, lse, gb, t: int, interpret: bool):
    """Core backward on (B*H, T_pad, D) operands; returns (dq, dk, dv) in
    the same layout."""
    bh, t_pad, d = qb.shape
    scale = float(1.0 / np.sqrt(d))
    bq, bk, t_pad2 = _pick_blocks(t)
    assert t_pad2 == t_pad, (t_pad2, t_pad)
    # di = rowsum(dO * O) — cheap elementwise reduce, stays in XLA
    di = jnp.sum(gb.astype(jnp.float32) * ob.astype(jnp.float32), axis=-1, keepdims=True)
    nq, nk = t_pad // bq, t_pad // bk
    bias = _key_bias(t, t_pad)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, nq=nq),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bhi, ki, qi: (bhi, qi, 0)),  # q
            pl.BlockSpec((1, bk, d), lambda bhi, ki, qi: (bhi, ki, 0)),  # k
            pl.BlockSpec((1, bk, d), lambda bhi, ki, qi: (bhi, ki, 0)),  # v
            pl.BlockSpec((1, bq, d), lambda bhi, ki, qi: (bhi, qi, 0)),  # do
            pl.BlockSpec((1, bq, 1), lambda bhi, ki, qi: (bhi, qi, 0)),  # lse
            pl.BlockSpec((1, bq, 1), lambda bhi, ki, qi: (bhi, qi, 0)),  # di
            pl.BlockSpec((1, bk), lambda bhi, ki, qi: (0, ki)),  # bias
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda bhi, ki, qi: (bhi, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda bhi, ki, qi: (bhi, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t_pad, d), kb.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), vb.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=interpret,
    )(qb, kb, vb, gb, lse, di, bias)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, nk=nk),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bhi, qi, ki: (bhi, qi, 0)),  # q
            pl.BlockSpec((1, bk, d), lambda bhi, qi, ki: (bhi, ki, 0)),  # k
            pl.BlockSpec((1, bk, d), lambda bhi, qi, ki: (bhi, ki, 0)),  # v
            pl.BlockSpec((1, bq, d), lambda bhi, qi, ki: (bhi, qi, 0)),  # do
            pl.BlockSpec((1, bq, 1), lambda bhi, qi, ki: (bhi, qi, 0)),  # lse
            pl.BlockSpec((1, bq, 1), lambda bhi, qi, ki: (bhi, qi, 0)),  # di
            pl.BlockSpec((1, bk), lambda bhi, qi, ki: (0, ki)),  # bias
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bhi, qi, ki: (bhi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), qb.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(qb, kb, vb, gb, lse, di, bias)

    return dq, dk, dv


def _flash_backward(q, k, v, o, lse, g, interpret: bool):
    b, t, h, d = q.shape
    _, _, t_pad = _pick_blocks(t)
    qb, kb, vb, ob, gb = (_to_bh(x, b, h, d, t_pad) for x in (q, k, v, o, g))
    dq, dk, dv = _flash_backward_bh(qb, kb, vb, ob, lse, gb, t, interpret)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_bh(q, k, v, t_real: int, interpret: bool | None = None):
    """Flash attention on HEAD-MAJOR operands: q/k/v (B*H, T_pad, D) with
    ``t_real`` the unpadded length (keys beyond it are masked); returns o in
    the same layout. For callers that already hold head-major data (e.g.
    TP-sharded attention where heads live on the mesh axis) this skips the
    (B, T, H, D) API's pad+transpose adapters. Measured v5e note: at the AST
    shape the adapters are NOT a bottleneck — an end-to-end head-major
    attention sublayer timed 4.81 vs 4.80 ms fwd+bwd
    (scripts/flash_layout_experiment.py); XLA already folds the transposes
    into neighbouring ops. The variant is kept for layout flexibility, not
    speed."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _flash_forward_bh(q, k, v, t_real, interpret)[0]


def _fwd_bh(q, k, v, t_real, interpret):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    o, lse = _flash_forward_bh(q, k, v, t_real, interpret)
    return o, (q, k, v, o, lse, interpret)


def _bwd_bh(t_real, _interpret_static, res, g):
    q, k, v, o, lse, interpret = res
    return _flash_backward_bh(q, k, v, o, lse, g, t_real, interpret)


flash_attention_bh.defvjp(_fwd_bh, _bwd_bh)
