"""Micro-time the AST train step's components on the chip.

Breaks the 90 ms bs=8 step (scripts/ast_ablation.py: fwd 30.3 / bwd 56.9 /
opt 2.6 ms) into patch-embed, per-encoder-layer (attn vs MLP), head+loss —
each as its own jitted value_and_grad — to find where the MFU gap vs the
~35% overall number lives. Components measured in isolation re-read inputs
from HBM that the fused step keeps in registers, so the parts sum to more
than the whole; ratios across components are the signal.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import numpy as np
import jax, jax.numpy as jnp
import flax.linen as nn
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.devices()[0].platform != "cpu", (
    "this measures the TPU path (axon can crash and silently fall back to CPU)")

from eav_tpu.models.transformer import TransformerLayer, MultiHeadSelfAttention

B, T, H = 8, 1214, 768
DT = jnp.bfloat16


def timegrad(module, x, steps=30, label=""):
    params = module.init(jax.random.PRNGKey(0), x)["params"]

    @jax.jit
    def fwd(p, x):
        return jnp.sum(module.apply({"params": p}, x).astype(jnp.float32))

    @jax.jit
    def both(p, x):
        return jax.value_and_grad(fwd)(p, x)

    for fn, tag in ((fwd, "fwd"), (both, "fwd+bwd")):
        out = fn(params, x); np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(params, x)
        np.asarray(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / steps * 1000
        print(f"{label} {tag}: {dt:.2f} ms", flush=True)


class PatchEmbed(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        x = nn.Conv(768, (16, 16), strides=(10, 10), padding="VALID",
                    name="patch_proj")(x)
        return x.reshape(x.shape[0], -1, 768)


class MLPOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        z = nn.LayerNorm(epsilon=1e-12, dtype=DT)(x)
        z = nn.Dense(3072, dtype=DT)(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(768, dtype=DT)(z)
        return x + z.astype(x.dtype)


class AttnOnly(nn.Module):
    attn_impl: str = "flash"

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-12, dtype=DT)(x)
        y = MultiHeadSelfAttention(768, 12, self.attn_impl, DT)(y)
        return x + y.astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.normal(size=(B, 1024, 128)).astype(np.float32))
    tok = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    tok_bf = tok.astype(DT)

    timegrad(PatchEmbed(), spec, label="patch_embed(conv16x16s10)")
    timegrad(MLPOnly(), tok, label="mlp(f32 residual)")
    timegrad(AttnOnly("flash"), tok, label="attn-flash(f32 residual)")
    timegrad(AttnOnly("xla"), tok, label="attn-xla(f32 residual)")
    timegrad(TransformerLayer(768, 12, 3072, dropout=0.0, attn_impl="flash",
                              dtype=DT), tok, label="full layer (f32 stream)")
    # bf16 residual stream variant: is HBM traffic on the f32 stream material?
    timegrad(MLPOnly(), tok_bf, label="mlp(bf16 residual)")
    timegrad(AttnOnly("flash"), tok_bf, label="attn-flash(bf16 residual)")
    timegrad(TransformerLayer(768, 12, 3072, dropout=0.0, attn_impl="flash",
                              dtype=DT), tok_bf, label="full layer (bf16 stream)")


if __name__ == "__main__":
    main()
