"""Opt-in parity tests that import the ACTUAL reference modules.

Every other parity test re-expresses the reference semantics by hand
(tests/test_eegnet_torch_parity.py, test_conformer_torch_parity.py) — a
shared misreading would pass both sides. These tests close that hole
(VERDICT r2 missing #3) by ``sys.path``-importing the real
`/root/reference` modules (read-only; NO code is copied into this repo)
and asserting:

- `CNN_torch/EEGNet_tor.py:15-67` logits == models/eegnet (weights copied),
- `Transformer_torch/Transformer_EEG.py:107-148` ShallowConvNet logits ==
  models/conformer_eeg,
- `EAV_datasplit.py:26-40` get_split == ingest/split.eav_split.

They skip cleanly when the reference tree is absent (any other machine).
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

REFERENCE_ROOT = os.environ.get("EAV_REFERENCE_ROOT", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference tree not available"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402


def _import_reference(module: str, subdir: str = ""):
    """Import a module from the reference tree by name, stubbing the dead
    ``Fusion.VIT_audio`` package (`CNN_torch/EEGNet_tor.py:4` imports a
    package that is not in the repo — SURVEY.md C4)."""
    if "Fusion" not in sys.modules:
        fusion = types.ModuleType("Fusion")
        vit_audio = types.ModuleType("Fusion.VIT_audio")
        ta = types.ModuleType("Fusion.VIT_audio.Transformer_audio")
        ta.Trainer_uni = object  # never instantiated by the import
        fusion.VIT_audio = vit_audio
        vit_audio.Transformer_audio = ta
        sys.modules["Fusion"] = fusion
        sys.modules["Fusion.VIT_audio"] = vit_audio
        sys.modules["Fusion.VIT_audio.Transformer_audio"] = ta
    paths = [REFERENCE_ROOT]
    if subdir:
        paths.append(os.path.join(REFERENCE_ROOT, subdir))
    saved = list(sys.path)
    sys.path[:0] = paths
    try:
        return importlib.import_module(module)
    finally:
        sys.path[:] = saved


def _t(a):
    return torch.from_numpy(np.asarray(a).copy())


def test_reference_eav_datasplit_matches_ours():
    """`EAV_datasplit.EAVDataSplit.get_split` == ingest/split.eav_split on
    random shuffled-label data, at both the 70/30 and 50/50 ratios."""
    mod = _import_reference("EAV_datasplit")
    from eav_tpu.ingest.split import eav_split

    rng = np.random.default_rng(0)
    x = rng.normal(size=(400, 6, 50)).astype(np.float32)
    y = np.repeat(np.arange(5), 80)[rng.permutation(400)]
    for h_idx in (40, 56):
        ref = mod.EAVDataSplit(x, y).get_split(h_idx=h_idx)
        ours = eav_split(x, y, h_idx=h_idx)
        for r, o in zip(ref, ours):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(o))


def test_reference_eegnet_tor_logits_match_ours():
    """The actual `EEGNet_tor` (hooks, 'same' padding, single 'separable'
    conv) produces our EEGNet's softmax outputs when weights are copied."""
    mod = _import_reference("EEGNet_tor", subdir="CNN_torch")
    from eav_tpu.models.eegnet import EEGNet

    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 30, 500)).astype(np.float32)
    model = EEGNet(dropout_rate=0.0)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    p = variables["params"]

    tm = mod.EEGNet_tor(nb_classes=5).eval()
    # Latent reference bug, discovered by importing the real module: the
    # max-norm forward hooks (`CNN_torch/EEGNet_tor.py:33-34,47-48`) end in
    # ``module.weight.data.renorm_(...)`` — an in-place op that RETURNS the
    # weight tensor, and a forward hook returning non-None REPLACES the
    # layer's output in torch. The depthwise hook therefore substitutes the
    # (64, 1, 30, 1) weight for the activations and the very next BatchNorm
    # crashes ("running_mean should contain 1 elements not 64"). The intended
    # semantics (weight renorm as a side effect — what our maxnorm_project
    # replicates) requires dropping the hooks' return values; clearing them
    # here is equivalent for a single eval forward (they only fire *after*
    # the layer runs anyway).
    assert tm.depthwiseConv._forward_hooks and tm.dense._forward_hooks
    tm.depthwiseConv._forward_hooks.clear()
    tm.dense._forward_hooks.clear()
    with torch.no_grad():
        # flax conv kernel (kh, kw, in, out) -> torch (out, in, kh, kw)
        tm.firstConv.weight.copy_(
            _t(np.transpose(np.asarray(p["conv_temporal"]["kernel"]), (3, 2, 0, 1)))
        )
        tm.depthwiseConv.weight.copy_(
            _t(np.transpose(np.asarray(p["conv_depthwise"]["kernel"]), (3, 2, 0, 1)))
        )
        tm.separableConv.weight.copy_(
            _t(np.transpose(np.asarray(p["conv_separable"]["kernel"]), (3, 2, 0, 1)))
        )
        # flax flattens NHWC (B, 1, 15, 64) w-major; torch flattens NCHW
        # (B, 64, 1, 15) f-major: permute the fc weight rows to compensate
        W = np.asarray(p["head"]["kernel"]).reshape(15, 64, 5)
        W = np.transpose(W, (1, 0, 2)).reshape(960, 5)
        tm.dense.weight.copy_(_t(W.T))
        tm.dense.bias.copy_(_t(p["head"]["bias"]))
        ref = tm(torch.from_numpy(x[:, None, :, :])).numpy()  # incl. Softmax

    ours = np.asarray(model.apply(variables, x, train=False))
    ours_soft = np.asarray(jax.nn.softmax(ours, axis=-1))
    np.testing.assert_allclose(ours_soft, ref, rtol=2e-4, atol=2e-4)


def test_reference_shallowconvnet_logits_match_ours():
    """The actual `ShallowConvNet` (per-filter ModuleList projection,
    per-head loops, V-residual, post-norm, power pooling) matches
    models/conformer_eeg with weights copied."""
    mod = _import_reference("Transformer_EEG", subdir="Transformer_torch")
    from eav_tpu.models.conformer_eeg import ConformerEEG

    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 30, 500)).astype(np.float32)
    model = ConformerEEG()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        x[:1], train=False,
    )
    p = variables["params"]

    tm = mod.ShallowConvNet(nb_classes=5).eval()
    with torch.no_grad():
        tm.conv.weight.copy_(
            _t(np.transpose(np.asarray(p["conv_temporal"]["kernel"]), (3, 2, 0, 1)))
        )
        spatial = np.asarray(p["spatial_proj"])  # (40 filters, 30 chans)
        for i, proj in enumerate(tm.embedding.value_proj):
            proj.weight.copy_(_t(spatial[i : i + 1]))
        for i, lyr in enumerate(tm.transformer):
            lp = p[f"layer_{i}"]
            lyr.attn.W_q.weight.copy_(_t(np.asarray(lp["attn"]["wq"]["kernel"]).T))
            lyr.attn.W_k.weight.copy_(_t(np.asarray(lp["attn"]["wk"]["kernel"]).T))
            lyr.attn.W_v.weight.copy_(_t(np.asarray(lp["attn"]["wv"]["kernel"]).T))
            lyr.norm1.weight.copy_(_t(lp["norm1"]["scale"]))
            lyr.norm1.bias.copy_(_t(lp["norm1"]["bias"]))
            lyr.ffn.net[0].weight.copy_(_t(np.asarray(lp["fc1"]["kernel"]).T))
            lyr.ffn.net[0].bias.copy_(_t(lp["fc1"]["bias"]))
            lyr.ffn.net[3].weight.copy_(_t(np.asarray(lp["fc2"]["kernel"]).T))
            lyr.ffn.net[3].bias.copy_(_t(lp["fc2"]["bias"]))
            lyr.norm2.weight.copy_(_t(lp["norm2"]["scale"]))
            lyr.norm2.bias.copy_(_t(lp["norm2"]["bias"]))
        tm.bn.weight.copy_(_t(p["bn"]["scale"]))
        tm.bn.bias.copy_(_t(p["bn"]["bias"]))
        # flax head kernel (2600, 5) is t-major; torch flatten is f-major
        k = np.asarray(p["head"]["kernel"]).reshape(65, 40, 5)
        k = np.transpose(k, (1, 0, 2)).reshape(2600, 5)
        tm.fc.weight.copy_(_t(k.T))
        ref = tm(torch.from_numpy(x[:, None])).numpy()  # incl. softmax

    ours = np.asarray(
        model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, x, train=False
        )
    )
    ours_soft = np.asarray(jax.nn.softmax(ours, axis=-1))
    np.testing.assert_allclose(ours_soft, ref, rtol=2e-4, atol=2e-4)
