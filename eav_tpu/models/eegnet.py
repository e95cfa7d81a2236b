"""EEGNet in Flax — the EAV EEG baseline model family.

Two variants, both behavioral ports of the reference:

- ``separable_mode='single'`` reproduces `CNN_torch/EEGNet_tor.py:15-67`
  (the variant used in the published sweeps), whose "separable" conv is in
  fact one full (1, 16) convolution.
- ``separable_mode='true'`` reproduces the clean rewrite
  `CNN_torch/CNN_EEG.py:7-67` (depthwise (1, 16) + pointwise (1, 1)).

EAV hyper-parameters: F1=8, D=8, F2=64, kernLength=300, Chans=30, Samples=500
(`EEGNet_tor.py:159-160`). Max-norm constraints (torch ``renorm_`` forward
hooks, `EEGNet_tor.py:33-34,47-48`) are applied functionally after each
optimizer step via :func:`eav_tpu.core.optim.maxnorm_project` with
:data:`EEGNet.maxnorm_rules`.

Layout is NHWC (batch, channels-as-height, time-as-width, features) — the
TPU-native layout; all convs are 1-D in time or across electrodes and XLA
maps them onto the MXU.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class FFTTemporalConv(nn.Module):
    """The (1, kern) 'SAME' temporal correlation computed via rFFT.

    Parameter layout identical to ``nn.Conv`` ((1, K, 1, F1) kernel under the
    same module name), so checkpoints and max-norm rules are interchangeable
    with the direct-conv path. Rationale: the 1->8 channel conv wastes ~94%
    of MXU lanes; the FFT formulation turns it into batched 1-D transforms.
    """

    features: int
    kern_length: int
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, C, T, 1)
        b, c, t, _ = x.shape
        k = self.kern_length
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, k, 1, self.features),
            jnp.float32,
        )
        dt = self.dtype or x.dtype
        n = int(2 ** np.ceil(np.log2(t + k)))
        pad_left = (k - 1) // 2
        z = jnp.pad(x[..., 0], ((0, 0), (0, 0), (pad_left, n - t - pad_left)))
        w = jnp.pad(kernel[0, :, 0, :], ((0, n - k), (0, 0)))  # (n, F)
        Z = jnp.fft.rfft(z.astype(jnp.float32), n, axis=-1)  # (B, C, n/2+1)
        W = jnp.fft.rfft(w, n, axis=0)  # (n/2+1, F)
        Y = Z[..., None] * jnp.conj(W)[None, None, :, :]
        y = jnp.fft.irfft(jnp.moveaxis(Y, -1, 1), n, axis=-1)  # (B, F, C, n)
        y = jnp.moveaxis(y, 1, -1)[:, :, :t, :]  # (B, C, T, F)
        return y.astype(dt)


class EEGNet(nn.Module):
    nb_classes: int = 5
    chans: int = 30
    samples: int = 500
    dropout_rate: float = 0.5
    kern_length: int = 300
    f1: int = 8
    d: int = 8
    f2: int = 64
    norm_rate: float = 1.0
    # the Keras EEGNet uses max_norm(0.25) on the dense layer and
    # max_norm(1.0) on the depthwise conv (`CNN_EEG_tf.py:39-41,56-57`);
    # the torch variant uses norm_rate for both. None = norm_rate.
    norm_rate_dense: float | None = None
    separable_mode: str = "single"  # 'single' (EEGNet_tor) | 'true' (CNN_EEG)
    # the Keras EEGNet has NO activation between the temporal conv's BN and
    # the depthwise conv (`CNN_EEG_tf.py:30-38`); the torch variant applies
    # ELU there (`EEGNet_tor.py:51-53`)
    first_activation: bool = True
    compute_dtype: object = None  # e.g. jnp.bfloat16; params and BN stay f32
    temporal_mode: str = "conv"  # 'conv' (lax conv) | 'fft' (rFFT correlation)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # (B, chans, samples) -> NHWC (B, chans, samples, 1)
        if x.ndim == 3:
            x = x[..., None]
        # torch-faithful BN: unbiased running-var update (models/norm.py) —
        # read constantly by the published trajectory via the sticky-eval
        # quirk (`EEGNet_tor.py:96-135`; config.compat_sticky_eval)
        from eav_tpu.models.norm import TorchBatchNorm

        bn = lambda name: TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        dt = self.compute_dtype
        # Block 1: temporal conv (1, kernLength), same padding, no bias
        if self.temporal_mode == "fft":
            x = FFTTemporalConv(
                self.f1, self.kern_length, dtype=dt, name="conv_temporal"
            )(x)
        else:
            x = nn.Conv(
                self.f1,
                (1, self.kern_length),
                padding="SAME",
                use_bias=False,
                name="conv_temporal",
                dtype=dt,
            )(x)
        x = bn("bn_temporal")(x)
        if self.first_activation:
            x = nn.elu(x)
        # Depthwise conv across electrodes: (chans, 1), F1 -> F1*D
        x = nn.Conv(
            self.f1 * self.d,
            (self.chans, 1),
            padding="VALID",
            feature_group_count=self.f1,
            use_bias=False,
            name="conv_depthwise",
            dtype=dt,
        )(x)
        x = bn("bn_depthwise")(x)
        x = nn.elu(x)
        x = nn.avg_pool(x, (1, 4), strides=(1, 4))
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        # Block 2: "separable" conv (1, 16)
        if self.separable_mode == "true":
            x = nn.Conv(
                self.f1 * self.d,
                (1, 16),
                padding="SAME",
                feature_group_count=self.f1 * self.d,
                use_bias=False,
                name="conv_sep_depthwise",
                dtype=dt,
            )(x)
            x = nn.Conv(
                self.f2, (1, 1), padding="SAME", use_bias=False,
                name="conv_sep_pointwise", dtype=dt,
            )(x)
        else:
            x = nn.Conv(
                self.f2, (1, 16), padding="SAME", use_bias=False,
                name="conv_separable", dtype=dt,
            )(x)
        x = bn("bn_separable")(x)
        x = nn.elu(x)
        x = nn.avg_pool(x, (1, 8), strides=(1, 8))
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = x.reshape((x.shape[0], -1))
        # 64 * (500 // 4 // 8) = 960 features (`EEGNet_tor.py:43`)
        return nn.Dense(self.nb_classes, name="head")(x.astype(jnp.float32))

    @property
    def maxnorm_rules(self) -> Tuple[Tuple[str, float, Tuple[int, ...]], ...]:
        """torch renorm dim=0 == per-output-channel norm: flax conv kernels
        are (kh, kw, in, out) -> axes (0,1,2); dense (in, out) -> axes (0,)."""
        dense_norm = self.norm_rate if self.norm_rate_dense is None else self.norm_rate_dense
        return (
            (r"conv_depthwise/kernel", self.norm_rate, (0, 1, 2)),
            (r"head/kernel", dense_norm, (0,)),
        )


def eegnet_keras(**kw) -> EEGNet:
    """The canonical Keras EEGNet as shipped in `CNN_tensorflow/CNN_EEG_tf.py`:
    true separable conv, no ELU after the first BN, dense max_norm 0.25."""
    defaults = dict(
        separable_mode="true", first_activation=False, norm_rate_dense=0.25
    )
    defaults.update(kw)
    return EEGNet(**defaults)
