"""Where does the AST train step's time go? Ablations on the real chip."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.devices()[0].platform != "cpu", (
    "this measures the TPU path (axon can crash and silently fall back to CPU)")
from eav_tpu.core.optim import adam_update, init_adam_state, trainable_mask
from eav_tpu.models.ast import AST
from eav_tpu.train.loop import cross_entropy

def timeit(fn, args, steps=20):
    out = fn(*args); np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(steps): out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / steps * 1000

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(8, 1024, 128)).astype(np.float32))
y = jnp.asarray(rng.integers(0, 5, size=(8,)).astype(np.int32))

for name, kw in [
    ("flash-bf16", dict(compute_dtype=jnp.bfloat16, attn_impl="flash")),
    ("xla-bf16", dict(compute_dtype=jnp.bfloat16, attn_impl="xla")),
]:
    model = AST(**kw)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    params = variables["params"]
    mask = trainable_mask(params, freeze=False)

    def loss_fn(p):
        return cross_entropy(model.apply({"params": p}, x, train=False), y, jnp.ones_like(y, jnp.float32))

    fwd = jax.jit(loss_fn)
    print(f"{name} fwd-only: {timeit(fwd, (params,)):.1f} ms", flush=True)

    grad = jax.jit(lambda p: jax.value_and_grad(loss_fn)(p))
    print(f"{name} fwd+bwd: {timeit(grad, (params,)):.1f} ms", flush=True)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt = adam_update(grads, opt, params, lr=5e-6, trainable_mask=mask, weight_decay=0.01)
        return loss, params, opt
    # donated buffers: rebind each call
    opt = init_adam_state(params)
    loss, p2, o2 = step(params, opt); np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(20):
        loss, p2, o2 = step(p2, o2)
    np.asarray(loss)
    t = (time.perf_counter() - t0) / 20 * 1000
    print(f"{name} full step: {t:.1f} ms = {8/t*1000:.1f} samples/s", flush=True)
    params = None
