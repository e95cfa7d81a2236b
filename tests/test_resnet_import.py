"""ResNet50 torchvision-checkpoint import: numeric parity + pipeline wiring.

The reference's video CNN starts from ``torchvision.models.resnet50(
pretrained=True)`` minus its head (`/root/reference/CNN_torch/CNN_Vision.py:32-33`).
torchvision is not installed in this image, so the oracle here is an in-test
torch reimplementation of ResNet50 that reproduces torchvision's exact module
tree (and therefore its state_dict key layout): conv1/bn1, layer{1..4}.{i}
bottlenecks with v1.5 stride placement (stride on the 3x3 conv2), and
downsample = [0]=conv / [1]=bn. A state dict from this model is
indistinguishable from a real ``resnet50-*.pth`` download.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402

from eav_tpu.models.resnet_attn import (  # noqa: E402
    ResNet50Backbone,
    convert_torchvision_resnet50,
)


class _Bottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        if stride != 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


class _TorchResNet50Backbone(nn.Module):
    """torchvision resnet50 minus avgpool/fc, torchvision key names."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), (3, 4, 6, 3))
        ):
            layers = []
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                layers.append(_Bottleneck(inplanes, planes, stride))
                inplanes = planes * 4
            setattr(self, f"layer{stage + 1}", nn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in (1, 2, 3, 4):
            x = getattr(self, f"layer{i}")(x)
        return x


def _randomized_torch_backbone(seed=0):
    torch.manual_seed(seed)
    m = _TorchResNet50Backbone().eval()
    # randomize BN affine + running stats so the import of those is exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.2, 0.2)
                mod.running_mean.uniform_(-0.1, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
    return m


def test_torchvision_resnet50_import_matches_torch_features():
    m = _randomized_torch_backbone()
    sd = m.state_dict()
    cv = convert_torchvision_resnet50(sd, None)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))  # NCHW -> NHWC

    out = ResNet50Backbone().apply(
        {"params": cv["params"], "batch_stats": cv["batch_stats"]},
        x, train=False,
    )
    out = np.asarray(out)
    assert out.shape == ref.shape
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(out - ref)) / scale < 1e-4


def test_pretrained_resnet_env_path_flows_into_frozen_fit(tmp_path, monkeypatch):
    """EAV_TPU_RESNET_CKPT -> _pretrained_params -> JitTrainer.fit overlay:
    after a freeze-phase fit the backbone must still equal the checkpoint
    (the reference freezes the backbone via requires_grad,
    `CNN_Vision.py:123-124`)."""
    m = _randomized_torch_backbone(seed=1)
    path = tmp_path / "resnet50-fake.pth"
    torch.save(m.state_dict(), str(path))
    monkeypatch.setenv("EAV_TPU_RESNET_CKPT", str(path))

    from eav_tpu.core.config import FinetuneConfig, PhaseConfig
    from eav_tpu.models.resnet_attn import ResNetAttn
    from eav_tpu.train import pipeline as P
    from eav_tpu.train.loop import JitTrainer

    init_params, init_bstats = P._pretrained_params("resnet_attn", 5)
    assert init_params is not None and "backbone" in init_params
    assert init_bstats is not None and "backbone" in init_bstats

    rng = np.random.default_rng(0)
    tr_x = rng.normal(size=(6, 32, 32, 3)).astype(np.float32)
    tr_y = rng.integers(0, 5, 6).astype(np.int32)
    te_x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    te_y = rng.integers(0, 5, 4).astype(np.int32)
    cfg = FinetuneConfig(
        model="resnet_attn", batch_size=6, optimizer="adamw",
        phases=(PhaseConfig(epochs=1, lr=1e-3, freeze=True),),
    )
    model = ResNetAttn()
    trainer = JitTrainer(model, cfg, head_regex=ResNetAttn.HEAD_REGEX)
    result = trainer.fit(
        (tr_x, tr_y, te_x, te_y), seed=0,
        init_params=init_params, init_batch_stats=init_bstats,
    )
    got = jax.tree.leaves(result.params["backbone"])
    want = jax.tree.leaves(init_params["backbone"])
    assert all(np.allclose(np.asarray(g), np.asarray(w)) for g, w in zip(got, want))


def test_overlay_params_semantics():
    from eav_tpu.train.loop import overlay_params

    base = {"a": {"x": 1, "y": 2}, "b": 3}
    out = overlay_params(base, {"a": {"y": 20}})
    assert out == {"a": {"x": 1, "y": 20}, "b": 3}
    with pytest.raises(KeyError):
        overlay_params(base, {"a": {"z": 9}})
    assert overlay_params(base, None) is base
