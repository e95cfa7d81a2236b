"""Frozen-phase feature cache (train/loop.py): a frozen phase replayed on
once-computed backbone features must match the full per-step backbone path —
same epoch histories, same final logits, same params entering the unfrozen
phase (the reference's protocol keeps ONE optimizer across phases,
`Transformer_Audio.py:30,45-48`, so the phase boundary state must be
identical either way)."""

import dataclasses

import jax
import numpy as np
import pytest

from eav_tpu.core.config import FinetuneConfig, PhaseConfig
from eav_tpu.core.optim import path_str
from eav_tpu.models.ast import ast_tiny
from eav_tpu.models.vit import vit_tiny
from eav_tpu.train.loop import JitTrainer


def _leaves(params):
    return {
        path_str(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }


def _cfg(**kw):
    base = dict(
        model="ast",
        batch_size=8,
        optimizer="adamw",
        weight_decay=0.01,
        phases=(
            PhaseConfig(epochs=3, lr=5e-4, freeze=True),
            PhaseConfig(epochs=2, lr=5e-6, freeze=False),
        ),
    )
    base.update(kw)
    return FinetuneConfig(**base)


def _compare(model, cfg, data, seed=0):
    """fit() with the cache on vs off; assert equal trajectories."""
    on = JitTrainer(model, cfg).fit(data, seed=seed)
    off = JitTrainer(
        model, dataclasses.replace(cfg, cache_frozen_features=False)
    ).fit(data, seed=seed)
    for k in ("loss", "train_acc", "test_acc"):
        np.testing.assert_allclose(
            on.history[k], off.history[k], rtol=1e-4, atol=1e-5, err_msg=k
        )
    np.testing.assert_allclose(on.outputs_test, off.outputs_test, rtol=1e-4, atol=1e-4)
    # the cached path materializes features from a separate XLA program, so
    # last-ulp differences are expected and Adam's sqrt-normalization of
    # near-zero grads amplifies their RELATIVE size on tiny leaves — same
    # 2e-4 envelope the stacked==serial invariant uses (tests/test_parallel.py)
    lon, loff = _leaves(on.params), _leaves(off.params)
    for name in lon:
        np.testing.assert_allclose(
            lon[name], loff[name], rtol=2e-4, atol=5e-5, err_msg=name
        )
    return on


def test_ast_cached_frozen_phase_matches_full_path():
    rng = np.random.default_rng(0)
    data = (
        rng.normal(size=(20, 128, 128)).astype(np.float32),
        rng.integers(0, 5, size=20).astype(np.int32),
        rng.normal(size=(9, 128, 128)).astype(np.float32),
        rng.integers(0, 5, size=9).astype(np.int32),
    )
    model = ast_tiny()
    trainer_on = JitTrainer(model, _cfg())
    assert trainer_on._frozen_cache_ok()
    _compare(model, _cfg(), data)


def test_vit_uint8_cached_frozen_phase_matches_full_path():
    rng = np.random.default_rng(1)
    data = (
        rng.integers(0, 256, size=(20, 64, 64, 3), dtype=np.uint8),
        rng.integers(0, 5, size=20).astype(np.int32),
        rng.integers(0, 256, size=(9, 64, 64, 3), dtype=np.uint8),
        rng.integers(0, 5, size=9).astype(np.int32),
    )
    model = vit_tiny(preprocess_uint8=True)
    _compare(model, _cfg(model="vit"), data)


def test_cached_phase_rng_parity_via_unfrozen_tail():
    """The unfrozen phase after a cached frozen phase must see the exact same
    PRNG key — proven by the full-trajectory equality above, re-asserted here
    on the backbone leaves (they only move in phase 2)."""
    rng = np.random.default_rng(2)
    data = (
        rng.normal(size=(16, 128, 128)).astype(np.float32),
        rng.integers(0, 5, size=16).astype(np.int32),
        rng.normal(size=(8, 128, 128)).astype(np.float32),
        rng.integers(0, 5, size=8).astype(np.int32),
    )
    model = ast_tiny()
    res = _compare(model, _cfg(), data)
    # and the backbone did move in phase 2 (the cached phase-1 state fed it)
    k_init = jax.random.split(jax.random.PRNGKey(0))[1]
    init = model.init({"params": k_init, "dropout": k_init}, data[0][:1], train=False)
    assert not np.allclose(
        _leaves(init["params"])["patch_proj/kernel"], _leaves(res.params)["patch_proj/kernel"]
    )


def test_gating():
    cfg = _cfg()
    # dropout in the backbone -> per-step stochastic features -> no cache
    assert not JitTrainer(ast_tiny(dropout=0.1), cfg)._frozen_cache_ok()
    # whole-tree regularizers read backbone kernels in the loss -> no cache
    assert not JitTrainer(ast_tiny(), _cfg(l1_reg=1e-4))._frozen_cache_ok()
    assert not JitTrainer(ast_tiny(), _cfg(l2_reg=1e-4))._frozen_cache_ok()
    # max-norm projection touches frozen leaves after each step -> no cache
    assert not JitTrainer(
        ast_tiny(), cfg, maxnorm_rules=(("classifier/kernel", 1.0, (0,)),)
    )._frozen_cache_ok()
    # models without the features/head split never take the path
    from eav_tpu.models.eegnet import EEGNet

    assert not JitTrainer(EEGNet(), cfg)._frozen_cache_ok()
    # explicit opt-out
    assert not JitTrainer(
        ast_tiny(), dataclasses.replace(cfg, cache_frozen_features=False)
    )._frozen_cache_ok()


def test_production_presets_engage_cache():
    """The flagship presets must keep the cache engaged — dropout>0 or a
    maxnorm rule sneaking into a preset would silently fall back to the
    ~2x-slower full frozen path (docs/ROUND3.md measured 182.4 -> 140.8 s
    vision, 115 -> 76 s audio warm subject)."""
    from eav_tpu.train.pipeline import build_model, default_presets

    presets = default_presets()
    for key in ("audio", "vision"):
        preset = presets[key]
        model, kw = build_model(preset)
        trainer = JitTrainer(model, preset.finetune, **kw)
        assert trainer._frozen_cache_ok(), key
        assert any(p.freeze for p in preset.finetune.phases), key


def test_head_mode_matches_full_forward():
    """full(x) == head(features(x)) on the same params."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 128, 128)).astype(np.float32)
    model = ast_tiny()
    k = jax.random.PRNGKey(0)
    params = model.init({"params": k, "dropout": k}, x[:1], train=False)["params"]
    full = model.apply({"params": params}, x, train=False)
    feats = model.apply({"params": params}, x, train=False, mode="features")
    head = model.apply({"params": params}, feats, train=False, mode="head")
    np.testing.assert_allclose(np.asarray(full), np.asarray(head), rtol=1e-6, atol=1e-6)
