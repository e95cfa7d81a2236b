"""EEGNet stacked-step ablation at production sweep shape (chip script).

The EEG leg of the 42-subject sweep runs `--subject-parallel 8`: 6 stacked
groups x 200 epochs x 9 steps ~= 92 ms/fused-step (round-3 full-sweep
journal, ~165 s/group). EEGNet's analytic step cost is ~55 GFLOP
(temporal-conv dominated) => ~0.3% MFU: the step is NOT compute-bound.
This script isolates where it goes and which lowering wins:

  variants: temporal_mode in {fft, conv} x compute_dtype in {f32, bf16}
  components: temporal conv alone, full fwd, full fwd+bwd+opt step

Shapes: stack S=8, bs=32, (30 ch, 500 samples) — `EEGNet_tor.py:159-161`.

Usage: python scripts/eegnet_stacked_ablation.py [--stack 8] [--iters 20]
Prints JSON lines. Run on the real TPU (asserts non-CPU backend).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np


def fence(x):
    import jax

    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def bench(fn, *args, iters=20):
    fence(fn(*args))  # compile
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stack", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu", "ablation measures the TPU path"

    from eav_tpu.core.optim import adam_update, init_adam_state, trainable_mask
    from eav_tpu.models.eegnet import EEGNet
    from eav_tpu.train.loop import cross_entropy

    S, BS, C, T = args.stack, 32, 30, 500
    rng = np.random.default_rng(0)
    bx = jnp.asarray(rng.normal(size=(S, BS, C, T, 1)).astype(np.float32))
    by = jnp.asarray(rng.integers(0, 5, size=(S, BS)).astype(np.int32))

    for mode in ("fft", "conv"):
        for dt_name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
            model = EEGNet(temporal_mode=mode, compute_dtype=dt)
            key = jax.random.PRNGKey(0)
            init_one = lambda k, x1: model.init(
                {"params": k, "dropout": k}, x1[:1], train=False
            )
            variables = jax.jit(jax.vmap(init_one))(
                jnp.stack([key] * S), bx
            )
            params, bstats = variables["params"], variables["batch_stats"]
            opt = jax.vmap(init_adam_state)(params)
            mask = trainable_mask(jax.tree.map(lambda p: p[0], params), freeze=False)

            # full train step, vmapped over the stack (the sweep's shape)
            def one_step(p, b, o, k, x, y):
                def loss_fn(pp):
                    logits, mut = model.apply(
                        {"params": pp, "batch_stats": b}, x, train=True,
                        rngs={"dropout": k}, mutable=["batch_stats"],
                    )
                    return cross_entropy(
                        logits, y, jnp.ones_like(y, jnp.float32), True
                    ), mut["batch_stats"]

                (loss, b2), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
                p2, o2 = adam_update(grads, o, p, lr=1e-5, trainable_mask=mask)
                return p2, b2, o2, loss

            ks = jax.vmap(jax.random.PRNGKey)(jnp.arange(S, dtype=jnp.uint32))
            step = jax.jit(jax.vmap(one_step))
            t_step = bench(
                lambda: step(params, bstats, opt, ks, bx, by), iters=args.iters
            )

            # forward only
            fwd = jax.jit(jax.vmap(
                lambda p, b, x: model.apply(
                    {"params": p, "batch_stats": b}, x, train=False
                )
            ))
            t_fwd = bench(lambda: fwd(params, bstats, bx), iters=args.iters)

            print(json.dumps({
                "variant": f"{mode}-{dt_name}",
                "stack": S,
                "step_ms": round(t_step * 1e3, 2),
                "fwd_ms": round(t_fwd * 1e3, 2),
                "samples_per_sec_step": round(S * BS / t_step),
                "phase_200ep_9steps_s": round(t_step * 1800, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
