"""ResNet50 + channel attention video classifier in Flax.

Behavioral port of `CNN_torch/CNN_Vision.py:26-63`: torchvision-layout
ResNet50 backbone (stem + [3,4,6,3] bottlenecks, v1.5 stride placement)
minus head, followed by the reference's CBAM-style channel attention —
shared fc1/fc2 over adaptive avg- and max-pooled features, summed, and
multiplied into the feature map *without* a sigmoid (a reference quirk kept
for parity, `:49-61`) — then global average pooling and an MLP head
2048 -> 1024 -> num_labels.

The freeze protocol freezes only the backbone (`CNN_Vision.py:123-124`), so
backbone params live under ``backbone/`` and trainers use
``head_regex=ResNetAttn.HEAD_REGEX`` (everything else trains while frozen).
Pretrained ImageNet weights import via a torchvision state_dict file if
provided (torchvision is not installed in this image).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from eav_tpu.models.norm import TorchBatchNorm


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    expansion: int = 4
    dtype: object = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # TorchBatchNorm, not flax BN: torch updates running_var with the
        # UNBIASED batch variance (models/norm.py) and the reference trains
        # with BN in train mode even during the frozen phase
        # (`CNN_Vision.py:128-133` model.train() regardless of requires_grad),
        # so every per-epoch eval reads torch-rule running stats.
        bn = lambda name: TorchBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * self.expansion, (1, 1),
                strides=(self.strides, self.strides), use_bias=False,
                dtype=self.dtype, name="down_conv",
            )(x)
            residual = bn("down_bn")(residual)
        return nn.relu(y + residual)


class ResNet50Backbone(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: object = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = TorchBatchNorm(  # torch-rule running stats, see Bottleneck
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(bn(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, blocks in enumerate(self.stage_sizes):
            for b in range(blocks):
                strides = 2 if (stage > 0 and b == 0) else 1
                x = Bottleneck(
                    64 * (2**stage), strides=strides, dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
        return x  # (B, 7, 7, 2048) for 224 inputs


class ResNetAttn(nn.Module):
    num_labels: int = 5
    # compute dtype for convs/denses/BN (e.g. jnp.bfloat16 for MXU
    # throughput — measured 25.2 -> 15.0 ms/step, 1,269 -> 2,131 samples/s,
    # at bs 32 224^2 on v5e; scripts/family_microbench.py); params and BN
    # running stats stay f32, logits are cast back to f32. None = all-f32
    # torch-parity numerics (the import-parity tests pin this default).
    compute_dtype: object = None
    HEAD_REGEX = r"^(?!backbone/)"  # freeze = backbone only (`CNN_Vision.py:123`)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = ResNet50Backbone(dtype=self.compute_dtype, name="backbone")(x, train)
        avg = feats.mean(axis=(1, 2))
        mx = feats.max(axis=(1, 2))
        fc1 = nn.Dense(2048, dtype=self.compute_dtype, name="attn_fc1")
        fc2 = nn.Dense(2048, dtype=self.compute_dtype, name="attn_fc2")
        attn = fc2(fc1(avg)) + fc2(fc1(mx))  # no sigmoid — reference quirk
        feats = feats * attn[:, None, None, :]
        pooled = feats.mean(axis=(1, 2))
        h = nn.relu(nn.Dense(1024, dtype=self.compute_dtype, name="cls_fc1")(pooled))
        logits = nn.Dense(self.num_labels, dtype=self.compute_dtype, name="cls_fc2")(h)
        return logits.astype(jnp.float32)


def convert_torchvision_resnet50(sd, params_template) -> dict:
    """torchvision resnet50 state_dict -> flax backbone params. Gated: only
    used when a local checkpoint file is supplied."""
    out = {"conv1": {"kernel": np.transpose(np.asarray(sd["conv1.weight"]), (2, 3, 1, 0))}}

    def bnmap(prefix):
        return {
            "scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        }

    def bnstats(prefix):
        return {
            "mean": np.asarray(sd[f"{prefix}.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.running_var"]),
        }

    out["bn1"] = bnmap("bn1")
    stats = {"bn1": bnstats("bn1")}
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            tp = f"layer{stage + 1}.{b}"
            fp = f"layer{stage + 1}_{b}"
            blk = {}
            bstat = {}
            for i in (1, 2, 3):
                blk[f"conv{i}"] = {
                    "kernel": np.transpose(np.asarray(sd[f"{tp}.conv{i}.weight"]), (2, 3, 1, 0))
                }
                blk[f"bn{i}"] = bnmap(f"{tp}.bn{i}")
                bstat[f"bn{i}"] = bnstats(f"{tp}.bn{i}")
            if f"{tp}.downsample.0.weight" in sd:
                blk["down_conv"] = {
                    "kernel": np.transpose(
                        np.asarray(sd[f"{tp}.downsample.0.weight"]), (2, 3, 1, 0)
                    )
                }
                blk["down_bn"] = bnmap(f"{tp}.downsample.1")
                bstat["down_bn"] = bnstats(f"{tp}.downsample.1")
            out[fp] = blk
            stats[fp] = bstat
    return {"params": out, "batch_stats": stats}
