"""Where does the ViT-base train step's time go? Ablations on the real chip.

The vision flagship (reference `Transformer_Vision.py:132-188`: ViT-base,
bs 128, 224^2 frames) measured ~820 samples/s for the bare step in round 2 —
~22% MFU, well under AST's 37%. This sweeps the same levers that moved AST:
patch-embed lowering (conv vs PatchProj slices/reshape), stream_dtype bf16,
attn_impl flash-vs-xla at T=197, and the on-device uint8 preprocessing cost.
Run AFTER the production sweep releases the chip.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
from eav_tpu.core.optim import adam_update, init_adam_state, trainable_mask
from eav_tpu.models.vit import ViT
from eav_tpu.train.loop import cross_entropy

BS = 128

def timeit(fn, args, steps=20):
    out = fn(*args); np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(steps): out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / steps * 1000

rng = np.random.default_rng(0)
x8 = jnp.asarray(rng.integers(0, 256, size=(BS, 224, 224, 3), dtype=np.uint8))
y = jnp.asarray(rng.integers(0, 5, size=(BS,)).astype(np.int32))

# ViT-base fwd: 197 tokens x ~172 MFLOP/token (2*86M params) + attention
# scores ~= 35.2 GFLOP (the oft-quoted "17.6G" is MACs); fwd+bwd = 3x fwd.
FLOP_PER_SAMPLE = 3 * 35.2e9  # ~105.7 GFLOP (ViT-base @224)

variants = [
    ("base (bf16, xla-attn, f32 stream)", dict(compute_dtype=jnp.bfloat16, preprocess_uint8=True)),
    ("+bf16 stream", dict(compute_dtype=jnp.bfloat16, preprocess_uint8=True, stream_dtype=jnp.bfloat16)),
    ("+flash attn", dict(compute_dtype=jnp.bfloat16, preprocess_uint8=True, attn_impl="flash")),
    ("+both", dict(compute_dtype=jnp.bfloat16, preprocess_uint8=True, attn_impl="flash", stream_dtype=jnp.bfloat16)),
]

for name, kw in variants:
    model = ViT(**kw)
    params = model.init(jax.random.PRNGKey(0), x8[:1], train=False)["params"]
    mask = trainable_mask(params, freeze=False)

    def loss_fn(p):
        return cross_entropy(model.apply({"params": p}, x8, train=False), y,
                             jnp.ones_like(y, jnp.float32))

    print(f"{name} fwd-only: {timeit(jax.jit(loss_fn), (params,)):.1f} ms", flush=True)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt = adam_update(grads, opt, params, lr=5e-6, trainable_mask=mask,
                                  weight_decay=0.01)
        return loss, params, opt
    opt = init_adam_state(params)
    loss, p2, o2 = step(params, opt); np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(20):
        loss, p2, o2 = step(p2, o2)
    np.asarray(loss)
    t = (time.perf_counter() - t0) / 20 * 1000
    tflops = BS * FLOP_PER_SAMPLE / (t / 1000) / 1e12
    print(f"{name} full step: {t:.1f} ms = {BS/t*1000:.0f} samples/s"
          f" = {tflops:.1f} TFLOP/s ({tflops/197*100:.1f}% MFU)", flush=True)
    params = p2 = o2 = None

# component: uint8 preprocess alone (cast+normalize at 224 — no resize)
pre = jax.jit(lambda z: ((jnp.asarray(z, jnp.float32) / 255.0 - 0.5) / 0.5).sum())
print(f"uint8 preprocess alone: {timeit(pre, (x8,)):.2f} ms", flush=True)

# component: patch embed conv vs PatchProj reshape at ViT geometry
from eav_tpu.models.transformer import PatchProj
for impl in ("conv", "slices"):
    pp = PatchProj(768, 16, (16, 16), impl=impl)
    xf = ((jnp.asarray(x8, jnp.float32) / 255.0) - 0.5) / 0.5
    pparams = pp.init(jax.random.PRNGKey(0), xf[:1])["params"]
    f = jax.jit(lambda p, z: jnp.sum(pp.apply({"params": p}, z) ** 2))
    g = jax.jit(jax.grad(lambda p, z: jnp.sum(pp.apply({"params": p}, z) ** 2)))
    print(f"patch_embed[{impl}] fwd {timeit(f, (pparams, xf)):.2f} ms"
          f" fwd-grad {timeit(g, (pparams, xf)):.2f} ms", flush=True)
