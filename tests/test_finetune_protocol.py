"""The freeze -> unfreeze fine-tune protocol on (tiny) AST: the reference's
two-phase recipe (`Dataload_audio.py:113-114`) with torch-faithful optimizer
semantics (core/optim.py)."""

import jax
import numpy as np
import pytest

from eav_tpu.core.config import FinetuneConfig, PhaseConfig
from eav_tpu.core.optim import path_str
from eav_tpu.models.ast import ast_tiny
from eav_tpu.train.loop import JitTrainer


def _leaves(params):
    return {
        path_str(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }


@pytest.fixture(scope="module")
def tiny_data():
    rng = np.random.default_rng(0)
    tr_x = rng.normal(size=(24, 128, 128)).astype(np.float32)
    tr_y = rng.integers(0, 5, size=24).astype(np.int32)
    te_x = rng.normal(size=(8, 128, 128)).astype(np.float32)
    te_y = rng.integers(0, 5, size=8).astype(np.int32)
    return tr_x, tr_y, te_x, te_y


def test_frozen_phase_only_trains_head(tiny_data):
    model = ast_tiny()
    cfg = FinetuneConfig(
        model="ast",
        batch_size=8,
        optimizer="adamw",
        weight_decay=0.01,
        phases=(PhaseConfig(epochs=1, lr=5e-4, freeze=True),),
    )
    trainer = JitTrainer(model, cfg)
    tr_x, tr_y, te_x, te_y = tiny_data
    rng = jax.random.PRNGKey(0)
    _, k_init = jax.random.split(rng)
    init_params = model.init({"params": k_init, "dropout": k_init}, tr_x[:1], train=False)[
        "params"
    ]
    res = trainer.fit(tiny_data, seed=0)
    before, after = _leaves(init_params), _leaves(res.params)
    # classifier (Dense + its LayerNorm) moved; everything else untouched
    assert not np.allclose(before["classifier/kernel"], after["classifier/kernel"])
    assert not np.allclose(before["classifier_ln/scale"], after["classifier_ln/scale"])
    for name in ("patch_proj/kernel", "encoder/layer_0/attn/query/kernel", "final_ln/scale", "cls_token"):
        np.testing.assert_array_equal(before[name], after[name])


def test_two_phase_protocol_runs_and_unfreezes(tiny_data):
    model = ast_tiny()
    cfg = FinetuneConfig(
        model="ast",
        batch_size=8,
        optimizer="adamw",
        weight_decay=0.01,
        phases=(
            PhaseConfig(epochs=2, lr=5e-4, freeze=True),
            PhaseConfig(epochs=2, lr=5e-6, freeze=False),
        ),
    )
    trainer = JitTrainer(model, cfg)
    res = trainer.fit(tiny_data, seed=0)
    assert res.history["test_acc"].shape == (4,)
    assert res.outputs_test.shape == (8, 5)
    # after unfreezing, the backbone moves
    rng = jax.random.PRNGKey(0)
    _, k_init = jax.random.split(rng)
    init_params = model.init(
        {"params": k_init, "dropout": k_init}, tiny_data[0][:1], train=False
    )["params"]
    before, after = _leaves(init_params), _leaves(res.params)
    assert not np.allclose(before["patch_proj/kernel"], after["patch_proj/kernel"])


def test_classifier_head_regex_matches_ast():
    from eav_tpu.core.optim import trainable_mask

    model = ast_tiny()
    params = model.init(jax.random.PRNGKey(0), np.zeros((1, 128, 128), np.float32))[
        "params"
    ]
    mask = _leaves(trainable_mask(params, freeze=True))
    trainable = {k for k, v in mask.items() if v}
    assert trainable == {
        "classifier/kernel",
        "classifier/bias",
        "classifier_ln/scale",
        "classifier_ln/bias",
    }


def test_phase_checkpoint_resume(tmp_path, tiny_data):
    """A rerun with checkpoint_dir resumes after completed phases and
    produces identical final params."""
    model = ast_tiny()
    cfg = FinetuneConfig(
        model="ast",
        batch_size=8,
        optimizer="adamw",
        weight_decay=0.01,
        phases=(
            PhaseConfig(epochs=1, lr=5e-4, freeze=True),
            PhaseConfig(epochs=1, lr=5e-6, freeze=False),
        ),
    )
    trainer = JitTrainer(model, cfg)
    ck = str(tmp_path / "ck")
    full = trainer.fit(tiny_data, seed=0, checkpoint_dir=ck)
    # remove phase1 checkpoint -> rerun resumes from phase0 and must
    # reproduce the same final params
    import os, shutil

    for suffix in ("", ".npz"):
        p = os.path.join(ck, "phase1" + suffix)
        if os.path.isdir(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)
    resumed = trainer.fit(tiny_data, seed=0, checkpoint_dir=ck)
    a = jax.tree.leaves(full.params)
    b = jax.tree.leaves(resumed.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-6)


def test_fully_resumed_fit_returns_result(tmp_path, tiny_data):
    """A rerun whose every phase is already checkpointed must return the
    saved final state instead of crashing (empty-history edge)."""
    model = ast_tiny()
    cfg = FinetuneConfig(
        model="ast", batch_size=8, optimizer="adamw", weight_decay=0.01,
        phases=(PhaseConfig(epochs=1, lr=5e-4, freeze=True),),
    )
    trainer = JitTrainer(model, cfg)
    ck = str(tmp_path / "ck")
    full = trainer.fit(tiny_data, seed=0, checkpoint_dir=ck)
    resumed = trainer.fit(tiny_data, seed=0, checkpoint_dir=ck)
    np.testing.assert_allclose(
        resumed.outputs_test, full.outputs_test, rtol=1e-5, atol=1e-6
    )
    assert np.isnan(resumed.history["train_acc"][-1])
    assert resumed.history["test_acc"][-1] >= 0.0
