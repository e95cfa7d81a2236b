"""Signal DSP as XLA ops: polyphase resampling and IIR (SOS) filtering.

The reference delegates these to scipy's C/Fortran kernels, invoked serially
per channel on host (`Dataload_eeg.py:98` resample_poly, `:113-121` order-5
Butterworth `sosfilt` looped over 30 channels of a ~2M-sample row). Here the
*design* step (tiny, host-side, runs once) uses scipy's well-tested filter
design, while the *compute* (tens of millions of MACs) is jit-compiled XLA:

- ``resample_poly``: polyphase FIR resampling as a single strided/dilated
  convolution (``lax.conv_general_dilated``), batched over channels.
- ``sosfilt``: cascaded biquads. Each biquad is decomposed (host-side, in
  float64) into partial fractions — a direct feed-through plus first-order
  complex recurrences ``u[n] = p u[n-1] + r x[n]`` with |p| < 1 — and each
  recurrence is evaluated with ``lax.associative_scan`` over *scalar* (gain,
  value) pairs (O(log n) depth, TPU-friendly), in fixed-size blocks chained
  by a ``lax.scan`` carry so peak memory stays bounded for arbitrarily long
  signals. Scalar pair-scans are perfectly conditioned (|p^k| <= 1), unlike
  the naive 2x2 companion-matrix scan whose near-defective matrix products
  amplify float32 rounding error exponentially for high-Q sections. A
  sequential ``lax.scan`` reference path is kept for validation.

Numerical parity with scipy is enforced by golden tests
(tests/test_signal.py) in float64 on CPU; production runs use float32.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# -----------------------------------------------------------------------------
# Host-side design (runs once per config; scipy is the design oracle)
# -----------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def design_butter_sos(order: int, lo: float, hi: float, fs: float) -> np.ndarray:
    """Order-``order`` Butterworth bandpass as second-order sections.

    Same design call as the reference (`Dataload_eeg.py:113`):
    ``butter(order, [lo, hi], btype='bandpass', fs=fs, output='sos')``.
    """
    from scipy.signal import butter

    return np.asarray(
        butter(order, [lo, hi], btype="bandpass", fs=fs, output="sos"),
        dtype=np.float64,
    )


@functools.lru_cache(maxsize=64)
def design_resample_fir(up: int, down: int) -> Tuple[np.ndarray, int]:
    """Kaiser-windowed lowpass FIR identical to scipy.signal.resample_poly's
    default design (window=('kaiser', 5.0), 10*max_rate taps each side).

    Returns (taps scaled by ``up``, half_len).
    """
    from scipy.signal import firwin

    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    return np.asarray(h, dtype=np.float64) * up, half_len


# -----------------------------------------------------------------------------
# Polyphase resampling
# -----------------------------------------------------------------------------


def upfirdn(h: jnp.ndarray, x: jnp.ndarray, up: int = 1, down: int = 1) -> jnp.ndarray:
    """Upsample-filter-downsample along the last axis.

    Matches scipy.signal.upfirdn semantics: zero-stuff by ``up``, full
    convolution with ``h``, take every ``down``-th output starting at 0.
    ``x`` may be (..., time); leading axes are treated as batch.
    """
    x = jnp.asarray(x)
    h = jnp.asarray(h, x.dtype)
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    xb = x.reshape((-1, 1, n))  # (batch, feature=1, time)
    nh = h.shape[0]
    # Full convolution: pad so output covers indices 0 .. (n-1)*up + nh - 1.
    # XLA convs are correlations; flip taps for true convolution.
    kernel = h[::-1].reshape((1, 1, nh))
    out = jax.lax.conv_general_dilated(
        xb,
        kernel,
        window_strides=(down,),
        padding=[(nh - 1, nh - 1)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    n_full = (n - 1) * up + nh  # length of the full convolution
    n_keep = -(-n_full // down)  # ceil
    out = out[:, 0, :n_keep]
    return out.reshape(batch_shape + (out.shape[-1],))


def resample_poly(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """scipy.signal.resample_poly equivalent (default Kaiser design) along the
    last axis, as one XLA convolution. Used by the EEG ingest to take 500 Hz
    trials to 100 Hz (reference `Dataload_eeg.py:94-102`)."""
    if up == down:
        return jnp.asarray(x)
    g = math.gcd(up, down)
    up, down = up // g, down // g
    h, half_len = design_resample_fir(up, down)
    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)  # ceil
    # scipy pre-pads the filter with zeros so the kept samples align with the
    # zero-phase (delay-compensated) output grid.
    n_pre_pad = (down - half_len % down) % down
    n_pre_remove = (half_len + n_pre_pad) // down
    h_padded = np.concatenate([np.zeros(n_pre_pad), h])
    y = upfirdn(jnp.asarray(h_padded, jnp.result_type(x, jnp.float32)), x, up, down)
    return y[..., n_pre_remove : n_pre_remove + n_out]


# -----------------------------------------------------------------------------
# SOS IIR filtering
# -----------------------------------------------------------------------------


def _linear_recurrence_blocked(p: complex, c: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """u[n] = p u[n-1] + c[n], u[-1] = 0, along the last axis of ``c``.

    Evaluated as a blocked associative scan over scalar (gain, value) pairs:
    within a block, the inclusive scan of elements (p, c_n) under
    (g2,v2)∘(g1,v1) = (g1 g2, g2 v1 + v2) yields (p^{n+1}, v_n) with
    u_n = p^{n+1-start} u_carry ... i.e. u_n = g_n * u_carry + v_n; blocks are
    chained with a sequential ``lax.scan`` carry. |p| < 1 keeps every partial
    product bounded, so float32 stays well-conditioned.
    """
    t = c.shape[-1]
    nblocks = -(-t // block_size)
    pad = nblocks * block_size - t
    if pad:
        c = jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, pad)])
    batch_shape = c.shape[:-1]
    cb = jnp.moveaxis(c.reshape(batch_shape + (nblocks, block_size)), -2, 0)
    p_arr = jnp.asarray(p, c.dtype)

    def combine(l, r):
        gl, vl = l
        gr, vr = r
        return gl * gr, gr * vl + vr

    def step(u_carry, c_block):
        g = jnp.broadcast_to(p_arr, c_block.shape)
        gs, vs = jax.lax.associative_scan(combine, (g, c_block), axis=c_block.ndim - 1)
        u = gs * u_carry[..., None] + vs
        return u[..., -1], u

    u0 = jnp.zeros(batch_shape, c.dtype)
    _, ub = jax.lax.scan(step, u0, cb)
    u = jnp.moveaxis(ub, 0, -2).reshape(batch_shape + (nblocks * block_size,))
    return u[..., :t] if pad else u


def _biquad_parfrac(section: np.ndarray):
    """Host-side (float64) partial-fraction decomposition of one biquad.

    H(w) = (b0 + b1 w + b2 w^2)/(1 + a1 w + a2 w^2), w = z^-1, with poles
    p1, p2 (roots of z^2 + a1 z + a2):
       H = C + A1/(1 - p1 w) + A2/(1 - p2 w),  C = b2/a2.
    Returns (C, [(p_i, A_i, scale_i)]) where scale is 2 for a conjugate pair
    represented by a single complex recurrence (y += scale * Re(u)).
    Returns None if the section is (near-)defective and needs the sequential
    path.
    """
    b0, b1, b2, _, a1, a2 = [float(v) for v in section]
    if abs(a2) < 1e-12:  # first-order or FIR section
        return None
    p1, p2 = np.roots([1.0, a1, a2])
    if abs(p1 - p2) < 1e-7 * max(1.0, abs(p1)):
        return None  # defective double pole: scan path
    N = lambda w: b0 + b1 * w + b2 * w * w
    C = b2 / a2
    A1 = N(1.0 / p1) / (1.0 - p2 / p1)
    if np.iscomplex(p1) and abs(p1.imag) > 1e-12:
        return C, [(complex(p1), complex(A1), 2.0)]
    A2 = N(1.0 / p2) / (1.0 - p1 / p2)
    return C, [
        (complex(p1), complex(A1), 1.0),
        (complex(p2), complex(A2), 1.0),
    ]


def _sosfilt_single_section_parallel(section: np.ndarray, x, block_size: int):
    """One biquad via partial fractions + scalar associative scans."""
    dec = _biquad_parfrac(section)
    if dec is None:
        return _sosfilt_single_section_scan(jnp.asarray(section, x.dtype), x)
    C, terms = dec
    cdtype = jnp.complex64 if x.dtype == jnp.float32 else jnp.complex128
    y = jnp.asarray(C, x.dtype) * x
    for p, A, scale in terms:
        c = jnp.asarray(A, cdtype) * x.astype(cdtype)
        u = _linear_recurrence_blocked(p, c, block_size)
        y = y + jnp.asarray(scale, x.dtype) * u.real.astype(x.dtype)
    return y


def _sosfilt_single_section_scan(section, x):
    """Sequential reference path (exact scipy op order)."""
    b0, b1, b2, _, a1, a2 = [section[i] for i in range(6)]

    def step(carry, xt):
        z1, z2 = carry
        yt = b0 * xt + z1
        z1n = b1 * xt - a1 * yt + z2
        z2n = b2 * xt - a2 * yt
        return (z1n, z2n), yt

    xt = jnp.moveaxis(x, -1, 0)
    zeros = jnp.zeros(x.shape[:-1], x.dtype)
    _, y = jax.lax.scan(step, (zeros, zeros), xt)
    return jnp.moveaxis(y, 0, -1)


@functools.lru_cache(maxsize=128)
def _compiled_sosfilt(sos_bytes: bytes, n_sections: int, method: str, block_size: int):
    sos = np.frombuffer(sos_bytes, dtype=np.float64).reshape(n_sections, 6)

    def impl(x):
        y = x
        for i in range(n_sections):
            if method == "parallel":
                y = _sosfilt_single_section_parallel(sos[i], y, block_size)
            elif method == "scan":
                y = _sosfilt_single_section_scan(jnp.asarray(sos[i], y.dtype), y)
            else:
                raise ValueError(f"unknown sosfilt method {method!r}")
        return y

    return jax.jit(impl)


def sosfilt(
    sos,
    x: jnp.ndarray,
    method: str = "parallel",
    block_size: int = 1 << 15,
) -> jnp.ndarray:
    """Cascaded second-order-section filter along the last axis (zi = 0),
    equivalent to scipy.signal.sosfilt.

    ``method='parallel'`` uses the partial-fraction + scalar-associative-scan
    evaluation (parallel over time, the TPU path); ``method='scan'`` is the
    sequential reference. ``sos`` must be a concrete (host) array — the
    decomposition happens in float64 when the jitted closure is built
    (cached per (sos, method, block_size))."""
    sos = np.ascontiguousarray(sos, np.float64)
    fn = _compiled_sosfilt(sos.tobytes(), sos.shape[0], method, block_size)
    return fn(jnp.asarray(x))


def bandpass_sos(
    x: jnp.ndarray,
    lo: float,
    hi: float,
    fs: float,
    order: int = 5,
    method: str = "parallel",
) -> jnp.ndarray:
    """Butterworth bandpass along the last axis — the reference's
    `Dataload_eeg.py:104-121` as one fused XLA op over all channels."""
    sos = design_butter_sos(order, lo, hi, fs)
    return sosfilt(sos, x, method=method)
