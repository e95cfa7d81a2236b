"""Conformer EEG, ResNet50+attention, fusion head: shape/semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eav_tpu.core.config import FinetuneConfig, PhaseConfig
from eav_tpu.core.optim import path_str, trainable_mask
from eav_tpu.models.conformer_eeg import ConformerEEG
from eav_tpu.models.fusion import FusionHead
from eav_tpu.models.resnet_attn import ResNetAttn
from eav_tpu.train.loop import JitTrainer


def _leaves(tree):
    return {
        path_str(p): v for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_conformer_flatten_is_2600():
    model = ConformerEEG()
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        np.zeros((2, 30, 500), np.float32),
        train=False,
    )
    # fc 2600 -> 5, no bias (`Transformer_EEG.py:128`)
    assert v["params"]["head"]["kernel"].shape == (2600, 5)
    assert "bias" not in v["params"]["head"]
    out = model.apply(v, np.zeros((2, 30, 500), np.float32), train=False)
    assert out.shape == (2, 5)


def test_conformer_trains_one_step(rng):
    x = rng.normal(size=(16, 30, 500)).astype(np.float32)
    y = rng.integers(0, 5, 16)
    cfg = FinetuneConfig(
        model="conformer_eeg",
        batch_size=8,
        optimizer="adam",
        weight_decay=0.0,
        phases=(PhaseConfig(epochs=1, lr=1e-3, freeze=False),),
        compat_softmax=True,
    )
    model = ConformerEEG()
    res = JitTrainer(model, cfg, maxnorm_rules=model.maxnorm_rules).fit(
        (x[:12], y[:12], x[12:], y[12:]), seed=0
    )
    # post-step fc maxnorm 0.5 (`Transformer_EEG.py:196-199`)
    head = np.asarray(_leaves(res.params)["head/kernel"])
    assert (np.sqrt((head**2).sum(axis=0)) <= 0.5 + 1e-5).all()


def test_resnet_attn_shapes(rng):
    model = ResNetAttn()
    x = np.zeros((1, 64, 64, 3), np.float32)  # small spatial for test speed
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(v, x, train=False)
    assert out.shape == (1, 5)
    leaves = _leaves(v["params"])
    assert leaves["attn_fc1/kernel"].shape == (2048, 2048)
    assert leaves["cls_fc1/kernel"].shape == (2048, 1024)


def test_resnet_bf16_compute_close_to_f32(rng):
    """compute_dtype=bf16 (MXU-throughput knob, measured 1.7x the f32 step
    on v5e — scripts/family_microbench.py) must stay a rounding-level
    perturbation of the all-f32 forward, keep f32 params/batch-stats (the
    torchvision import-parity tests pin the f32 default), and return f32
    logits."""
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    base = ResNetAttn()
    v = base.init(jax.random.PRNGKey(0), x, train=False)
    bf_model = base.clone(compute_dtype=jnp.bfloat16)
    # init under bf16 compute must produce the identical f32 param tree
    # (param_dtype stays f32) so checkpoints import either way
    v_bf = bf_model.init(jax.random.PRNGKey(0), x, train=False)
    fl, fl_bf = _leaves(v["params"]), _leaves(v_bf["params"])
    # identical tree structure first, so the leaf-wise loop can't vacuously
    # pass on a silently-divergent param tree
    assert set(fl) == set(fl_bf)
    for (pa, a), (pb, b) in zip(sorted(fl.items()), sorted(fl_bf.items())):
        assert pa == pb and a.dtype == b.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=pa)
    ref = base.apply(v, x, train=False)
    bf = bf_model.apply(v, x, train=False)
    assert bf.dtype == ref.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(bf), np.asarray(ref), rtol=0.15, atol=0.3)
    assert not np.array_equal(np.asarray(bf), np.asarray(ref))
    # BN running stats must stay f32 through a bf16 TRAIN step too — the
    # eval-only check would let a Flax default change silently demote the
    # checkpointed batch_stats dtype
    _, mut = bf_model.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    for path, leaf in _leaves(mut["batch_stats"]).items():
        assert leaf.dtype == jnp.float32, path


def test_resnet_freeze_regex():
    model = ResNetAttn()
    v = model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32), train=False)
    mask = _leaves(trainable_mask(v["params"], freeze=True, head_regex=ResNetAttn.HEAD_REGEX))
    assert mask["attn_fc1/kernel"] is True  # attention trains while frozen
    assert mask["cls_fc2/kernel"] is True
    assert mask["backbone/conv1/kernel"] is False
    assert all(not v for k, v in mask.items() if k.startswith("backbone/"))


def test_fusion_head_modes(rng):
    logits = rng.normal(size=(8, 3, 5)).astype(np.float32)
    for mode in ("weighted", "mlp"):
        model = FusionHead(mode=mode)
        v = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(logits),
            train=False,
        )
        out = model.apply(v, jnp.asarray(logits), train=False)
        assert out.shape == (8, 5)


def test_fusion_weighted_beats_single_modality(rng):
    """If one modality is informative and two are noise, the trained fusion
    must reach the informative modality's accuracy."""
    n, c = 300, 5
    y = rng.integers(0, c, n)
    good = np.eye(c)[y] * 2.0 + rng.normal(size=(n, c)) * 0.5
    noise1 = rng.normal(size=(n, c))
    noise2 = rng.normal(size=(n, c))
    x = np.stack([good, noise1, noise2], axis=1).astype(np.float32)
    cfg = FinetuneConfig(
        model="fusion",
        batch_size=32,
        optimizer="adamw",
        weight_decay=1e-4,
        phases=(PhaseConfig(epochs=30, lr=5e-2, freeze=False),),
    )
    res = JitTrainer(FusionHead(mode="weighted"), cfg).fit(
        (x[:200], y[:200], x[200:], y[200:]), seed=0
    )
    solo_acc = (good[200:].argmax(-1) == y[200:]).mean()
    assert res.history["test_acc"][-1] >= solo_acc - 0.03


def test_encoder_remat_modes_match_values_and_grads(rng):
    """remat='attn'/'full' must be numerically identical to 'none' (same
    values, same grads, same param tree — nn.remat keeps submodule scopes so
    checkpoints import regardless of mode). The modes exist so big stacked /
    long-context programs can trade one extra attention forward for the
    q/k/v/o residuals (models/transformer.py TransformerLayer)."""
    from eav_tpu.models.ast import ast_tiny

    x = jnp.asarray(rng.normal(size=(2, 128, 128)).astype(np.float32))
    base = ast_tiny()
    params = base.init(jax.random.PRNGKey(0), x, train=False)["params"]

    def loss(model, p):
        return jnp.sum(model.apply({"params": p}, x, train=False) ** 2)

    ref_l, ref_g = jax.value_and_grad(lambda p: loss(base, p))(params)
    for mode in ("attn", "full"):
        m = base.clone(remat=mode)
        l, g = jax.value_and_grad(lambda p: loss(m, p))(params)
        assert float(l) == float(ref_l)
        # recomputation changes XLA's fusion choices, so grads agree to f32
        # roundoff, not bitwise
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-4),
            ref_g, g,
        )


def test_ast_bf16_stream_close_to_f32(rng):
    """stream_dtype=bf16 (the TPU preset's HBM-traffic saving) must stay a
    rounding-level perturbation of the f32-stream forward, and the default
    (stream_dtype=None) must remain bitwise the pre-knob f32 path — the HF
    logit-parity tests pin that default."""
    from eav_tpu.models.ast import ast_tiny

    x = jnp.asarray(rng.normal(size=(2, 128, 128)).astype(np.float32))
    base = ast_tiny()
    params = base.init(jax.random.PRNGKey(0), x, train=False)["params"]
    ref = base.apply({"params": params}, x, train=False)
    bf = base.clone(stream_dtype=jnp.bfloat16).apply(
        {"params": params}, x, train=False
    )
    assert ref.dtype == bf.dtype  # head always recovers the f32 path's dtype
    np.testing.assert_allclose(np.asarray(bf), np.asarray(ref), rtol=0.1, atol=0.15)
    assert not np.array_equal(np.asarray(bf), np.asarray(ref))
