"""AST patch-embed lowering experiments on the chip.

XLA lowers the overlapping 16x16-stride-10 patch conv badly: 2.38 ms fwd at
bs8 for 3.8 GFLOP of work (scripts/ast_component_times.py). Candidates keep
the exact same math (same weights, same output) but feed the MXU one big
(B*1212, 256) x (256, 768) gemm after an explicit patch extraction:

  conv     nn.Conv baseline
  patches  lax.conv_general_dilated_patches then gemm
  gather   advanced-indexing gather (B,12,101,16,16) then einsum
  slices   12 static freq slices -> (B,12,16,1024) then 1-D conv over time

Also times the full AST step with stream_dtype=bf16 vs f32.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", f"not on TPU: {jax.default_backend()}"

B = 8
rng = np.random.default_rng(0)
spec = jnp.asarray(rng.normal(size=(B, 1024, 128)).astype(np.float32))
W = jnp.asarray(rng.normal(size=(16, 16, 1, 768)).astype(np.float32) * 0.02)
bias = jnp.zeros((768,), jnp.float32)


def timeit(fn, args, steps=30, label=""):
    out = fn(*args); np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    print(f"{label}: {(time.perf_counter()-t0)/steps*1000:.2f} ms", flush=True)
    return out


def pre(x):  # (B, frames, mels) -> NHWC (B, 128, 1024, 1)
    return jnp.transpose(x, (0, 2, 1))[..., None]


@jax.jit
def conv_ref(x):
    x = pre(x)
    y = jax.lax.conv_general_dilated(
        x, W, (10, 10), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y + bias).reshape(B, -1, 768)


@jax.jit
def patches_fn(x):
    x = pre(x)
    p = jax.lax.conv_general_dilated_patches(
        x, (16, 16), (10, 10), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # p: (B, 12, 101, 256) with feature order C-major (c, kh, kw) = (kh, kw) here
    w2 = W.reshape(256, 768)
    return (p.reshape(B, -1, 256) @ w2 + bias)


IDX_F = np.arange(12)[:, None] * 10 + np.arange(16)[None, :]   # (12, 16)
IDX_T = np.arange(101)[:, None] * 10 + np.arange(16)[None, :]  # (101, 16)


@jax.jit
def gather_fn(x):
    x = jnp.transpose(x, (0, 2, 1))  # (B, 128 freq, 1024 time)
    p = x[:, IDX_F[:, None, :, None], IDX_T[None, :, None, :]]  # (B,12,101,16,16)
    w2 = W.reshape(256, 768)
    return (p.reshape(B, -1, 256) @ w2 + bias)


@jax.jit
def slices_fn(x):
    x = jnp.transpose(x, (0, 2, 1))  # (B, 128, 1024)
    rows = jnp.stack([jax.lax.dynamic_slice_in_dim(x, 10 * f, 16, 1)
                      for f in range(12)], 1)          # (B, 12, 16, 1024)
    cols = jnp.stack([jax.lax.dynamic_slice_in_dim(rows, 10 * t, 16, 3)
                      for t in range(101)], 2)         # (B, 12, 101, 16, 16)
    w2 = W.reshape(256, 768)
    return (cols.reshape(B, -1, 256) @ w2 + bias)


ref = timeit(conv_ref, (spec,), label="conv   fwd")
for fn, name in ((patches_fn, "patches"), (gather_fn, "gather "), (slices_fn, "slices ")):
    out = timeit(fn, (spec,), label=f"{name} fwd")
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"{name} max|err| vs conv: {err:.2e}", flush=True)

# gradient (wrt weights) versions — what the train step actually runs
for impl, name in ((conv_ref, "conv   "), (patches_fn, "patches"), (gather_fn, "gather "), (slices_fn, "slices ")):
    def loss(w, x, impl=impl):
        global W
        old, W = W, w
        try:
            return jnp.sum(impl.__wrapped__(x) ** 2)
        finally:
            W = old
    g = jax.jit(jax.grad(loss))
    timeit(g, (W, spec), label=f"{name} grad")

# full-step stream-dtype comparison
from eav_tpu.core.optim import adam_update, init_adam_state, trainable_mask
from eav_tpu.models.ast import AST
from eav_tpu.train.loop import cross_entropy

y = jnp.asarray(rng.integers(0, 5, size=(B,)).astype(np.int32))
for label, kw in [
    ("step f32-stream", dict(compute_dtype=jnp.bfloat16, attn_impl="flash")),
    ("step bf16-stream", dict(compute_dtype=jnp.bfloat16, attn_impl="flash",
                              stream_dtype=jnp.bfloat16)),
]:
    model = AST(**kw)
    params = model.init(jax.random.PRNGKey(0), spec[:1], train=False)["params"]
    mask = trainable_mask(params, freeze=False)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt):
        def loss_fn(p):
            return cross_entropy(model.apply({"params": p}, spec, train=False), y,
                                 jnp.ones_like(y, jnp.float32))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt = adam_update(grads, opt, params, lr=5e-6,
                                  trainable_mask=mask, weight_decay=0.01)
        return loss, params, opt

    opt = init_adam_state(params)
    loss, p2, o2 = step(params, opt); np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(20):
        loss, p2, o2 = step(p2, o2)
    np.asarray(loss)
    t = (time.perf_counter() - t0) / 20 * 1000
    print(f"{label}: {t:.1f} ms = {B/t*1000:.1f} samples/s", flush=True)
    params = None
