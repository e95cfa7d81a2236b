"""torch-faithful BatchNorm.

``flax.linen.BatchNorm`` updates its running variance with the BIASED batch
variance; ``torch.nn.BatchNorm2d`` normalizes with the biased variance but
updates ``running_var`` with the UNBIASED estimator (Bessel-corrected,
``n/(n-1)`` — documented torch behavior). The difference (~1/n relative) is
invisible while running stats sit at init, which is why the eval-mode logit
parity tests never caught it — but it shifts every eval forward once stats
have been trained, and the reference's published EEG trajectories read their
running stats constantly: ``Trainer_uni`` trains epochs 2+ entirely in eval
mode (the sticky-eval quirk, `CNN_torch/EEGNet_tor.py:96-135`), and every
trainer's per-epoch test eval uses them (`Transformer_EEG.py:205-219`).

:class:`TorchBatchNorm` is a drop-in for the flax module at our call sites
(same ``use_running_average``/``momentum``/``epsilon`` constructor surface,
same 'scale'/'bias' params and 'mean'/'var' batch_stats names, so existing
checkpoints and weight-copy tests are unaffected) with torch's exact update
rule. Stats and affine stay float32 regardless of input dtype (the same
invariant tests/test_models_misc.py pins for the flax BN under bf16
compute)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchBatchNorm(nn.Module):
    """BatchNorm over the trailing feature axis with torch's semantics:

    - train: normalize with the biased batch variance; update running stats
      as ``ra = (1 - m_torch) * ra + m_torch * batch`` where the variance
      contribution is Bessel-corrected (``n/(n-1)``), ``m_torch = 1 -
      momentum`` (flax momentum convention kept: 0.9 == torch 0.1).
    - eval (``use_running_average=True``): normalize with the running stats.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    # output compute dtype: normalization math always runs in f32 (stats and
    # affine stay f32 — torch numerics), but a bf16-stream model (e.g.
    # ResNetAttn compute_dtype=bfloat16) wants the output back in its stream
    # dtype, matching what flax BN with dtype=bf16 hands downstream layers.
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)

        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = x.size // feat  # elements reduced per feature (N*H*W)
            mean = jnp.mean(xf, axes)
            # biased variance normalizes the batch (torch does the same)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                bessel = n / (n - 1) if n > 1 else 1.0
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * var * bessel
                )
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype) if self.dtype is not None else y
