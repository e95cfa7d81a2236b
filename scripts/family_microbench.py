"""Chip microbench for the NON-flagship model families: the production
train_step body (`train/loop.py _phase_pieces`) at each family's reference
protocol shape. Measured under a per-step jit; the sweep runs the same body
inside the fused lax.scan phase program, which XLA fuses differently, so
ms/step can drift slightly from production (see the stacked-vs-serial
fusion-divergence note in CLAUDE.md):

- conformer_eeg  (`Transformer_torch/Transformer_EEG.py:221-247`): bs 32,
  (30, 500) trials, 485-epoch protocol.
- scnn_audio     (notebook C14, `CNN_tensorflow/CNN_audio_emotion_recognition
  .ipynb` cell0:210): bs 64, 180-d features, 50/50 split (200 train rows).
- resnet_vision  (`CNN_torch/CNN_Vision.py:174-216`): bs 32, 224x224x3
  frames, two-phase freeze protocol (unfrozen step measured — the hot one).

The flagships (AST, ViT, EEGNet, MTCNN) have their own measured numbers
(bench.py, scripts/measure_*_flagship.py, scripts/vit_ablation.py); this
script closes the remaining families so every SURVEY.md §2 model family has
a hardware-measured row (docs/RUNBOOK.md).

Usage: python scripts/family_microbench.py [conformer|scnn|resnet|all]
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

from eav_tpu.core.config import get_preset
from eav_tpu.core.optim import init_adam_state, trainable_mask
from eav_tpu.train.loop import JitTrainer
from eav_tpu.train.pipeline import build_model


def bench_preset(preset_name: str, x: np.ndarray, y: np.ndarray,
                 steps: int = 50, flops_per_sample: float | None = None,
                 model_kwargs: dict | None = None, label: str = ""):
    """Time the production train step (unfrozen phase) for ``preset_name``
    on random data shaped like the reference protocol."""
    import dataclasses

    preset = get_preset(preset_name)
    if model_kwargs:
        kw = dict(preset.finetune.model_kwargs)
        kw.update(model_kwargs)
        preset = preset.replace(
            finetune=dataclasses.replace(preset.finetune, model_kwargs=kw)
        )
    model, mkw = build_model(preset)
    trainer = JitTrainer(model, preset.finetune, **mkw)
    n_train = int(x.shape[0])

    x = jnp.asarray(x)
    y = jnp.asarray(y)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    opt = init_adam_state(params)
    mask = trainable_mask(params, freeze=False)
    train_step, _eval, _perm, (bs, _sf, _rem), _accs = trainer._phase_pieces(
        mask, n_train, n_train
    )
    step = jax.jit(
        lambda carry, idx, lr: train_step(carry, idx, x, y, lr),
        donate_argnums=(0,),
    )
    lr = jnp.float32(preset.finetune.phases[-1].lr)
    idx = jnp.arange(bs)
    carry = (params, bstats, opt, jax.random.PRNGKey(1))
    carry, (loss, _) = step(carry, idx, lr)  # compile + warm
    np.asarray(loss)  # fence (block_until_ready unreliable on this platform)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry, (loss, _) = step(carry, idx, lr)
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / steps
    sps = bs / dt
    line = f"{preset_name}{label}: bs={bs} step={dt*1e3:.2f} ms  {sps:,.1f} samples/s"
    if flops_per_sample:
        achieved = sps * flops_per_sample
        # dtype-appropriate v5e MXU peak: 197 TFLOP/s bf16, ~98.5 f32
        is_bf16 = (preset.finetune.model_kwargs or {}).get("compute_dtype") in (
            "bfloat16", jnp.bfloat16,
        )
        peak = 197e12 if is_bf16 else 98.5e12
        line += (
            f"  ({achieved/1e12:.1f} TFLOP/s, {100*achieved/peak:.1f}% of "
            f"v5e {'bf16' if is_bf16 else 'f32'} peak)"
        )
    print(line, flush=True)
    return sps


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    assert jax.default_backend() != "cpu", "run on the TPU (chip microbench)"

    if which in ("all", "conformer"):
        x = rng.normal(size=(280, 30, 500)).astype(np.float32)
        y = rng.integers(0, 5, size=(280,)).astype(np.int32)
        bench_preset("conformer_eeg", x, y)
    if which in ("all", "scnn"):
        x = rng.normal(size=(200, 180)).astype(np.float32)
        y = rng.integers(0, 5, size=(200,)).astype(np.int32)
        bench_preset("scnn_audio", x, y)
    if which in ("all", "resnet"):
        x = rng.normal(size=(256, 224, 224, 3)).astype(np.float32)
        y = rng.integers(0, 5, size=(256,)).astype(np.int32)
        # ResNet50 fwd ~4.1 GFLOP at 224^2; x3 for fwd+bwd (attention/MLP
        # head adds ~1%). Analytic count for the MFU column only.
        bench_preset("resnet_vision", x, y, steps=20, flops_per_sample=12.3e9,
                     label=" (f32)")
        bench_preset("resnet_vision", x, y, steps=20, flops_per_sample=12.3e9,
                     model_kwargs={"compute_dtype": "bfloat16"}, label=" (bf16)")


if __name__ == "__main__":
    main()
