"""TPU microbenchmarks: EEGNet/AST train-step throughput, f32 vs bf16, and
flash-attention vs XLA einsum. Run on real hardware; results feed
BENCH notes and kernel decisions. Usage: python scripts/tpu_microbench.py [all|eegnet|ast|attn]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from eav_tpu.core.optim import adam_update, init_adam_state, trainable_mask
from eav_tpu.train.loop import cross_entropy


def timeit(step, args, steps=20, chained=None):
    out = step(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    cur = args
    for _ in range(steps):
        out = step(*cur)
        if chained:
            cur = chained(cur, out)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / steps


def bench_model_step(model, x, y, label, lr=1e-4, wd=0.0):
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    opt = init_adam_state(params)
    mask = trainable_mask(params, freeze=False)

    @jax.jit
    def step(params, opt, x, y):
        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": bstats}, x, train=False
            )
            return cross_entropy(out, y, jnp.ones_like(y, jnp.float32))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt = adam_update(grads, opt, params, lr=lr, trainable_mask=mask, weight_decay=wd)
        return loss, params, opt

    dt = timeit(step, (params, opt, x, y), chained=lambda cur, out: (out[1], out[2], x, y))
    print(f"{label}: {dt*1000:.2f} ms/step, {x.shape[0]/dt:.1f} samples/s", flush=True)
    return dt


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    if which in ("all", "eegnet"):
        from eav_tpu.models.eegnet import EEGNet

        x = jnp.asarray(rng.normal(size=(256, 30, 500)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, 5, 256).astype(np.int32))
        bench_model_step(EEGNet(dropout_rate=0.0), x, y, "eegnet f32 bs256")
        bench_model_step(
            EEGNet(dropout_rate=0.0, compute_dtype=jnp.bfloat16), x, y, "eegnet bf16 bs256"
        )
    if which in ("all", "ast"):
        from eav_tpu.models.ast import AST

        x = jnp.asarray(rng.normal(size=(8, 1024, 128)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, 5, 8).astype(np.int32))
        bench_model_step(AST(), x, y, "ast f32 bs8", wd=0.01)
        bench_model_step(AST(compute_dtype=jnp.bfloat16), x, y, "ast bf16 bs8", wd=0.01)
        bench_model_step(
            AST(compute_dtype=jnp.bfloat16, attn_impl="flash"), x, y,
            "ast bf16+flash bs8", wd=0.01,
        )
    if which in ("vit",):
        bench_vit()
    if which in ("all", "attn"):
        from eav_tpu.models.ast import AST

        x = jnp.asarray(rng.normal(size=(8, 1024, 128)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, 5, 8).astype(np.int32))
        bench_model_step(AST(attn_impl="flash"), x, y, "ast f32+flash bs8", wd=0.01)




def bench_vit():
    from eav_tpu.models.vit import ViT

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(128, 224, 224, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, 128).astype(np.int32))
    bench_model_step(ViT(), x, y, "vit f32 bs128", wd=0.01)
    bench_model_step(ViT(compute_dtype=jnp.bfloat16), x, y, "vit bf16 bs128", wd=0.01)


if __name__ == "__main__":
    main()
