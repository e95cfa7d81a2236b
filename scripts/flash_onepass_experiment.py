"""One-pass flash forward at the AST length: with T_pad=1280 the whole
(1280, 1280) f32 score tile fits scoped VMEM (~11 MB with operands), so a
single-K-block kernel can do plain softmax (one max/exp/sum pass) instead of
the online recurrence (max/exp/alpha-rescale per K block). Times kernel-only
fwd and the full attention-sublayer fwd+bwd against the streaming kernel.
Also times tanh-approx vs erf GELU on the MLP for information.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()

from eav_tpu.ops.pallas.attention import flash_attention, _pick_blocks, _to_bh, _from_bh

B, T, H, D = 8, 1214, 12, 64
NEG_INF = -1e30


def _onepass_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, t_real, scale):
    s = scale * jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < t_real, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o_ref[0] = (jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    ) / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


def onepass_forward(q, k, v):
    b, t, h, d = q.shape
    scale = float(1.0 / np.sqrt(d))
    _, _, t_pad = _pick_blocks(t)
    qb, kb, vb = (_to_bh(x, b, h, d, t_pad) for x in (q, k, v))
    out, lse = pl.pallas_call(
        functools.partial(_onepass_kernel, t_real=t, scale=scale),
        grid=(b * h,),
        in_specs=[pl.BlockSpec((1, t_pad, d), lambda i: (i, 0, 0))] * 3,
        out_specs=(
            pl.BlockSpec((1, t_pad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t_pad, 1), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, t_pad, 1), jnp.float32),
        ),
    )(qb, kb, vb)
    return _from_bh(out, b, h, t, d)


rng = np.random.default_rng(0)
q, k, v = (jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32)).astype(jnp.bfloat16)
           for _ in range(3))


def timeit(fn, args, label, steps=50):
    out = fn(*args); np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    print(f"{label}: {(time.perf_counter()-t0)/steps*1000:.2f} ms", flush=True)
    return out


f_stream = jax.jit(lambda q, k, v: flash_attention(q, k, v))
f_one = jax.jit(onepass_forward)
a = timeit(f_stream, (q, k, v), "fwd streaming (640 blocks)")
b_ = timeit(f_one, (q, k, v), "fwd one-pass  (1280 full)")
err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32))))
print(f"max|err|: {err:.2e}", flush=True)

# GELU erf vs tanh on the MLP shape (information only — HF parity pins erf)
x = jnp.asarray(rng.normal(size=(B, T, 3072)).astype(np.float32)).astype(jnp.bfloat16)
for approx, label in ((False, "gelu erf  "), (True, "gelu tanh ")):
    fn = jax.jit(lambda x, a=approx: jax.nn.gelu(x, approximate=a))
    timeit(fn, (x,), label)
