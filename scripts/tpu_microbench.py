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
    if which in ("all", "flash4k"):
        bench_attention_4k()
    if which in ("all", "attn"):
        from eav_tpu.models.ast import AST

        x = jnp.asarray(rng.normal(size=(8, 1024, 128)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, 5, 8).astype(np.int32))
        bench_model_step(AST(attn_impl="flash"), x, y, "ast f32+flash bs8", wd=0.01)




def bench_attention_4k():
    """Flash (Pallas fwd+bwd) vs XLA einsum attention at long context —
    train-step (value+grad) wall-clock. The XLA path materializes
    (B, H, T, T) scores in HBM; flash never does, so past a few thousand
    tokens the kernel should win on bandwidth (VERDICT round-1 missing #4)."""
    import json

    from eav_tpu.ops.pallas.attention import _reference_attention, flash_attention

    rng = np.random.default_rng(0)

    def bench_one(t, b, h, d, dtype, label):
        q, k, v = (
            jnp.asarray(rng.normal(size=(b, t, h, d)), dtype) for _ in range(3)
        )

        def make_step(attn):
            @jax.jit
            def step(q, k, v):
                def loss(q, k, v):
                    return (attn(q, k, v).astype(jnp.float32) ** 2).sum()

                return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

            return step

        dt_flash = timeit(make_step(lambda *a: flash_attention(*a, False)), (q, k, v))
        try:
            dt_xla = timeit(make_step(_reference_attention), (q, k, v))
        except Exception as e:  # XLA OOMs holding (T, T) probs at long T
            print(
                json.dumps(
                    {
                        "case": label,
                        "flash_ms": round(dt_flash * 1000, 2),
                        "xla_ms": None,
                        "xla_error": type(e).__name__,
                    }
                ),
                flush=True,
            )
            return
        print(
            json.dumps(
                {
                    "case": label,
                    "flash_ms": round(dt_flash * 1000, 2),
                    "xla_ms": round(dt_xla * 1000, 2),
                    "speedup_vs_xla": round(dt_xla / dt_flash, 2),
                }
            ),
            flush=True,
        )

    import sys as _sys

    if "--long" in _sys.argv:
        # The long-context regime the seam exists for: XLA must materialize
        # (and for the backward, save) the (H, T, T) probabilities — at 16k+
        # tokens that is multi-GB of HBM traffic/capacity per layer.
        bench_one(16384, 1, 8, 64, jnp.bfloat16, "attn fwd+bwd T=16384 B=1 H=8 D=64 bf16")
        bench_one(32768, 1, 4, 64, jnp.bfloat16, "attn fwd+bwd T=32768 B=1 H=4 D=64 bf16")
        return
    bench_one(4096, 2, 8, 64, jnp.bfloat16, "attn fwd+bwd T=4096 B=2 H=8 D=64 bf16")
    bench_one(4096, 2, 8, 64, jnp.float32, "attn fwd+bwd T=4096 B=2 H=8 D=64 f32")
    bench_one(8192, 1, 8, 64, jnp.bfloat16, "attn fwd+bwd T=8192 B=1 H=8 D=64 bf16")
    bench_one(1280, 8, 12, 64, jnp.bfloat16, "attn fwd+bwd T=1280 (AST-ish) bf16")


def bench_vit():
    from eav_tpu.models.vit import ViT

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(128, 224, 224, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, 128).astype(np.int32))
    bench_model_step(ViT(), x, y, "vit f32 bs128", wd=0.01)
    bench_model_step(ViT(compute_dtype=jnp.bfloat16), x, y, "vit bf16 bs128", wd=0.01)


if __name__ == "__main__":
    main()
