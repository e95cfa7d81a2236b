"""Conformer (ShallowConvNet x Transformer) logits parity vs a torch oracle.

The oracle re-expresses `Transformer_torch/Transformer_EEG.py:14-148`'s
semantics (independently written, vectorized where the reference loops over
ModuleLists): temporal conv -> per-filter spatial projection -> 12 post-norm
transformer layers with a V-residual -> BN -> square -> AvgPool -> log-clamp
power pooling -> no-bias fc. Weights are copied from the Flax model, so any
drift in the vectorized math fails the allclose (VERDICT round-1 missing #6).

Note the one deliberate layout difference: the Flax model flattens the pooled
(T', F) map t-major while torch flattens f-major — equivalent up to a
permutation of fc rows, which this test applies when copying the fc weight.
"""

import jax
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from eav_tpu.models.conformer_eeg import ConformerEEG

CHANS, SAMPLES, FILT, KERN, LAYERS = 30, 500, 40, 13, 12


class TorchConformerOracle(tnn.Module):
    """Reference semantics, heads=1, written against the paper description."""

    def __init__(self, nb_classes=5):
        super().__init__()
        self.conv = tnn.Conv2d(1, FILT, (1, KERN), bias=False)
        # per-filter spatial projection as one (FILT, CHANS) matrix
        self.spatial = tnn.Parameter(torch.zeros(FILT, CHANS))
        self.layers = tnn.ModuleList()
        for _ in range(LAYERS):
            self.layers.append(
                tnn.ModuleDict(
                    dict(
                        wq=tnn.Linear(FILT, FILT, bias=False),
                        wk=tnn.Linear(FILT, FILT, bias=False),
                        wv=tnn.Linear(FILT, FILT, bias=False),
                        norm1=tnn.LayerNorm(FILT),
                        fc1=tnn.Linear(FILT, FILT * 4),
                        fc2=tnn.Linear(FILT * 4, FILT),
                        norm2=tnn.LayerNorm(FILT),
                    )
                )
            )
        self.bn = tnn.BatchNorm2d(FILT)
        self.fc = tnn.Linear(2600, nb_classes, bias=False)

    def forward(self, x):  # x: (B, 1, CHANS, SAMPLES)
        x = self.conv(x)  # (B, F, C, T)
        # token[b,t,f] = sum_c x[b,f,c,t] * spatial[f,c]
        v = torch.einsum("bfct,fc->btf", x, self.spatial)
        for lyr in self.layers:
            q, k, val = lyr["wq"](v), lyr["wk"](v), lyr["wv"](v)
            attn = tF.softmax(q @ k.transpose(-1, -2) / FILT**0.5, dim=-1)
            a = attn @ val + val  # the reference's V-residual
            v = v + lyr["norm1"](a)  # post-norm; dropout inactive in eval
            f = lyr["fc2"](tF.relu(lyr["fc1"](v)))
            v = v + lyr["norm2"](f)
        h = v.permute(0, 2, 1).unsqueeze(2)  # (B, F, 1, T)
        h = self.bn(h)
        h = torch.square(h)
        h = tF.avg_pool2d(h, (1, 35), stride=(1, 7))  # (B, F, 1, 65)
        h = torch.log(torch.clamp(h, 1e-7, 1e4))
        h = torch.flatten(h.squeeze(2), 1)  # f-major (F * 65)
        return self.fc(h)


def _copy_weights(flax_params, oracle: TorchConformerOracle):
    p = flax_params

    def t(a):
        return torch.from_numpy(np.asarray(a).copy())

    with torch.no_grad():
        # flax conv kernel (1, KERN, 1, F) -> torch (F, 1, 1, KERN)
        oracle.conv.weight.copy_(t(np.transpose(p["conv_temporal"]["kernel"], (3, 2, 0, 1))))
        oracle.spatial.copy_(t(p["spatial_proj"]))
        for i, lyr in enumerate(oracle.layers):
            lp = p[f"layer_{i}"]
            lyr["wq"].weight.copy_(t(np.asarray(lp["attn"]["wq"]["kernel"]).T))
            lyr["wk"].weight.copy_(t(np.asarray(lp["attn"]["wk"]["kernel"]).T))
            lyr["wv"].weight.copy_(t(np.asarray(lp["attn"]["wv"]["kernel"]).T))
            lyr["norm1"].weight.copy_(t(lp["norm1"]["scale"]))
            lyr["norm1"].bias.copy_(t(lp["norm1"]["bias"]))
            lyr["fc1"].weight.copy_(t(np.asarray(lp["fc1"]["kernel"]).T))
            lyr["fc1"].bias.copy_(t(lp["fc1"]["bias"]))
            lyr["fc2"].weight.copy_(t(np.asarray(lp["fc2"]["kernel"]).T))
            lyr["fc2"].bias.copy_(t(lp["fc2"]["bias"]))
            lyr["norm2"].weight.copy_(t(lp["norm2"]["scale"]))
            lyr["norm2"].bias.copy_(t(lp["norm2"]["bias"]))
        oracle.bn.weight.copy_(t(p["bn"]["scale"]))
        oracle.bn.bias.copy_(t(p["bn"]["bias"]))
        # flax head kernel (2600, 5) is t-major (t*F + f); torch input is
        # f-major (f*65 + t): permute rows before transposing
        k = np.asarray(p["head"]["kernel"]).reshape(65, FILT, 5)
        k = np.transpose(k, (1, 0, 2)).reshape(65 * FILT, 5)
        oracle.fc.weight.copy_(t(k.T))


def test_conformer_logits_match_torch_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, CHANS, SAMPLES)).astype(np.float32)

    model = ConformerEEG()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        x[:1], train=False,
    )
    ours = np.asarray(
        model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x, train=False,
        )
    )
    assert ours.shape == (4, 5)

    oracle = TorchConformerOracle().eval()
    _copy_weights(variables["params"], oracle)
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x[:, None])).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_conformer_flatten_is_2600():
    """The fc input is 65*40 = 2600 (`Transformer_EEG.py:128`)."""
    model = ConformerEEG()
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        np.zeros((1, CHANS, SAMPLES), np.float32), train=False,
    )
    assert v["params"]["head"]["kernel"].shape == (2600, 5)
