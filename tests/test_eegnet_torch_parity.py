"""EEGNet logits parity vs a torch implementation of EEGNet_tor semantics
(`CNN_torch/EEGNet_tor.py:15-67`, eval mode, softmax omitted — argmax
invariant) with weights copied from the Flax model. Catches layout/padding
convention mismatches (NHWC vs NCHW, 'same' asymmetry for the even
kernLength=300)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402

from eav_tpu.models.eegnet import EEGNet  # noqa: E402


class TorchEEGNetTor(nn.Module):
    """EEGNet_tor forward semantics (minus Softmax: CE-parity is tested via
    compat_softmax separately)."""

    def __init__(self, C=30, T=500, F1=8, D=8, F2=64, K=300, ncls=5):
        super().__init__()
        self.conv1 = nn.Conv2d(1, F1, (1, K), padding="same", bias=False)
        self.bn1 = nn.BatchNorm2d(F1)
        self.conv2 = nn.Conv2d(F1, F1 * D, (C, 1), groups=F1, bias=False)
        self.bn2 = nn.BatchNorm2d(F1 * D)
        self.conv3 = nn.Conv2d(F1 * D, F2, (1, 16), padding="same", bias=False)
        self.bn3 = nn.BatchNorm2d(F2)
        self.fc = nn.Linear(F2 * (T // 4 // 8), ncls)
        self.elu = nn.ELU()

    def forward(self, x):
        x = self.elu(self.bn1(self.conv1(x)))
        x = self.elu(self.bn2(self.conv2(x)))
        x = nn.functional.avg_pool2d(x, (1, 4))
        x = self.elu(self.bn3(self.conv3(x)))
        x = nn.functional.avg_pool2d(x, (1, 8))
        return self.fc(torch.flatten(x, 1))


def test_eegnet_matches_torch_reference(rng):
    model = EEGNet(dropout_rate=0.0)
    x = rng.normal(size=(4, 30, 500)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    p = variables["params"]

    tm = TorchEEGNetTor().eval()
    with torch.no_grad():
        # flax conv kernel (kh, kw, in, out) -> torch (out, in, kh, kw)
        tm.conv1.weight.copy_(
            torch.from_numpy(np.transpose(np.asarray(p["conv_temporal"]["kernel"]), (3, 2, 0, 1)))
        )
        # depthwise: flax (C, 1, in_per_group=1, out=64) -> torch (64, 1, C, 1)
        tm.conv2.weight.copy_(
            torch.from_numpy(np.transpose(np.asarray(p["conv_depthwise"]["kernel"]), (3, 2, 0, 1)))
        )
        tm.conv3.weight.copy_(
            torch.from_numpy(np.transpose(np.asarray(p["conv_separable"]["kernel"]), (3, 2, 0, 1)))
        )
        tm.fc.weight.copy_(torch.from_numpy(np.asarray(p["head"]["kernel"]).T))
        tm.fc.bias.copy_(torch.from_numpy(np.asarray(p["head"]["bias"])))
        # flax flatten order: NHWC (B, 1, 15, 64) -> (B, 15*64) interleaved
        # differently than torch NCHW (B, 64, 1, 15) -> (B, 64*15): permute
        # the fc weight columns to compensate.
        W = np.asarray(p["head"]["kernel"])  # (960, 5), flax order (w-major)
        W_t = W.reshape(15, 64, 5).transpose(1, 0, 2).reshape(960, 5)
        tm.fc.weight.copy_(torch.from_numpy(W_t.T))

        ref = tm(torch.from_numpy(x[:, None, :, :])).numpy()

    ours = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_torch_batchnorm_matches_torch(rng):
    """models/norm.TorchBatchNorm == torch.nn.BatchNorm2d through a train
    sequence: normalized outputs AND running stats (torch updates running_var
    with the UNBIASED batch variance — the flax module uses the biased one,
    which shifts every eval forward once stats have trained)."""
    from eav_tpu.models.norm import TorchBatchNorm

    import jax

    feat = 6
    m = TorchBatchNorm(use_running_average=False)
    tm = torch.nn.BatchNorm2d(feat)
    x0 = rng.normal(size=(4, 3, 5, feat)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), x0)
    stats = variables["batch_stats"]
    with torch.no_grad():
        tm.weight.copy_(torch.from_numpy(np.asarray(variables["params"]["scale"])))
        tm.bias.copy_(torch.from_numpy(np.asarray(variables["params"]["bias"])))
    tm.train()
    for i in range(3):
        x = rng.normal(size=(4, 3, 5, feat)).astype(np.float32) * (i + 1) + i
        y, mut = m.apply(
            {"params": variables["params"], "batch_stats": stats},
            x, mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]
        # torch is NCHW
        ty = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        np.testing.assert_allclose(
            np.asarray(y), np.transpose(ty.detach().numpy(), (0, 2, 3, 1)),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(stats["mean"]), tm.running_mean.numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(stats["var"]), tm.running_var.numpy(), rtol=1e-5, atol=1e-6
        )
    # eval forwards use the accumulated stats identically
    tm.eval()
    xe = rng.normal(size=(4, 3, 5, feat)).astype(np.float32)
    ye = TorchBatchNorm(use_running_average=True).apply(
        {"params": variables["params"], "batch_stats": stats}, xe
    )
    tye = tm(torch.from_numpy(np.transpose(xe, (0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.asarray(ye), np.transpose(tye.detach().numpy(), (0, 2, 3, 1)),
        rtol=1e-5, atol=1e-5,
    )
