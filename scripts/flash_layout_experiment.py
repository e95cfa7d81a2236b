"""Does producing q/k/v head-major (and consuming o head-major) beat the
(B,T,H,D) flash API's materialized pad+transpose round-trips? Attention
sublayer fwd+bwd at the AST shape, both layouts, same math."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()

from eav_tpu.ops.pallas.attention import flash_attention, flash_attention_bh, _pick_blocks

B, T, H, DH = 8, 1214, 12, 64
HID = H * DH
DT = jnp.bfloat16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, T, HID)).astype(np.float32)).astype(DT)
Wqkv = jnp.asarray((rng.normal(size=(HID, 3, HID)) * 0.02).astype(np.float32)).astype(DT)
Wout = jnp.asarray((rng.normal(size=(HID, HID)) * 0.02).astype(np.float32)).astype(DT)


def attn_bthd(x, Wqkv, Wout):
    qkv = jnp.einsum("btc,ckf->btkf", x, Wqkv)
    q = qkv[:, :, 0, :].reshape(B, T, H, DH)
    k = qkv[:, :, 1, :].reshape(B, T, H, DH)
    v = qkv[:, :, 2, :].reshape(B, T, H, DH)
    ctx = flash_attention(q, k, v).reshape(B, T, HID)
    return ctx @ Wout


def attn_bhtd(x, Wqkv, Wout):
    w = Wqkv.reshape(HID, 3, H, DH)
    _, _, t_pad = _pick_blocks(T)
    qkv = jnp.einsum("btc,ckhd->kbhtd", x, w)  # gemm output already head-major
    qkv = jnp.pad(qkv, ((0, 0), (0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    q, k, v = (qkv[i].reshape(B * H, t_pad, DH) for i in range(3))
    o = flash_attention_bh(q, k, v, T)
    o = o.reshape(B, H, t_pad, DH)[:, :, :T, :]
    return jnp.einsum("bhtd,hdc->btc", o, Wout.reshape(H, DH, HID))


def timegrad(fn, label, steps=30):
    def loss(x, wq, wo):
        return jnp.sum(fn(x, wq, wo).astype(jnp.float32) ** 2)

    g = jax.jit(jax.value_and_grad(loss, argnums=(1, 2)))
    out = g(x, Wqkv, Wout); np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = g(x, Wqkv, Wout)
    np.asarray(out[0])
    print(f"{label}: {(time.perf_counter()-t0)/steps*1000:.2f} ms", flush=True)
    return float(out[0])


la = timegrad(attn_bthd, "bthd (current)")
lb = timegrad(attn_bhtd, "bhtd (head-major)")
print(f"loss match: {la:.6g} vs {lb:.6g} rel {abs(la-lb)/abs(la):.2e}", flush=True)
