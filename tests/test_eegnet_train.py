"""EEGNet end-to-end: shapes, max-norm constraints, learnability on synthetic
data (the framework's upgrade of the reference's only smoke test,
`CNN_torch/CNN_EEG.py:166-184`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eav_tpu.core.config import FinetuneConfig, PhaseConfig
from eav_tpu.core.optim import maxnorm_project, path_str, trainable_mask
from eav_tpu.models.eegnet import EEGNet
from eav_tpu.train.loop import JitTrainer, cross_entropy


def _flat_params(params):
    return {
        path_str(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }


def test_eegnet_flatten_dim_is_960():
    # 64 * (500 // 4 // 8) = 960, reference `EEGNet_tor.py:43`
    model = EEGNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 30, 500)), train=False)
    flat = _flat_params(variables["params"])
    assert flat["head/kernel"].shape == (960, 5)
    out = model.apply(variables, jnp.zeros((2, 30, 500)), train=False)
    assert out.shape == (2, 5)


def test_eegnet_true_separable_variant():
    model = EEGNet(separable_mode="true")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 30, 500)), train=False)
    flat = _flat_params(variables["params"])
    assert flat["conv_sep_depthwise/kernel"].shape == (1, 16, 1, 64)
    assert flat["conv_sep_pointwise/kernel"].shape == (1, 1, 64, 64)


def test_maxnorm_projection():
    model = EEGNet(norm_rate=1.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 30, 500)), train=False)
    params = jax.tree.map(lambda p: p * 100.0, variables["params"])
    proj = maxnorm_project(params, model.maxnorm_rules)
    flat = _flat_params(proj)
    dw = flat["conv_depthwise/kernel"]  # (30, 1, 1, 64): norm over (0,1,2)
    norms = np.sqrt((dw**2).sum(axis=(0, 1, 2)))
    assert (norms <= 1.0 + 1e-5).all()
    head = flat["head/kernel"]  # (960, 5): per-output-unit norm over axis 0
    assert (np.sqrt((head**2).sum(axis=0)) <= 1.0 + 1e-5).all()
    # untouched leaves stay scaled
    assert np.abs(flat["conv_temporal/kernel"]).max() > 1.0


def test_trainable_mask_freeze():
    model = EEGNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 30, 500)), train=False)
    mask = trainable_mask(variables["params"], freeze=True)
    flat = {
        path_str(p): v for p, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    assert flat["head/kernel"] is True and flat["head/bias"] is True
    assert flat["conv_temporal/kernel"] is False


def test_compat_softmax_loss_differs():
    logits = jnp.array([[2.0, -1.0, 0.5, 0.0, -2.0]])
    labels = jnp.array([0])
    w = jnp.ones(1)
    plain = cross_entropy(logits, labels, w, compat_softmax=False)
    compat = cross_entropy(logits, labels, w, compat_softmax=True)
    assert not np.isclose(float(plain), float(compat))
    # double softmax flattens: loss closer to uniform -log(1/5)
    assert float(compat) > float(plain)


@pytest.mark.slow
def test_eegnet_learns_synthetic(rng):
    """Class-separable synthetic EEG must reach well-above-chance test
    accuracy; random labels must stay near chance (SURVEY.md §4)."""
    n_per, chans, samples = 24, 8, 128
    n = n_per * 5
    x = rng.normal(size=(n, chans, samples)).astype(np.float32)
    y = np.repeat(np.arange(5), n_per)
    # class-specific sinusoid at distinct frequencies on channel 0
    t = np.arange(samples) / 100.0
    for c in range(5):
        x[y == c, 0, :] += 4.0 * np.sin(2 * np.pi * (4 + 3 * c) * t)
    idx = rng.permutation(n)
    x, y = x[idx], y[idx]
    tr_x, tr_y, te_x, te_y = x[:80], y[:80], x[80:], y[80:]

    cfg = FinetuneConfig(
        model="eegnet",
        batch_size=16,
        optimizer="adam",
        weight_decay=0.0,
        phases=(PhaseConfig(epochs=60, lr=1e-3, freeze=False),),
    )
    model = EEGNet(chans=chans, samples=samples, kern_length=32, dropout_rate=0.2)
    trainer = JitTrainer(model, cfg, maxnorm_rules=model.maxnorm_rules)
    result = trainer.fit((tr_x, tr_y, te_x, te_y), seed=0)
    assert result.outputs_test.shape == (40, 5)
    assert result.history["test_acc"][-1] > 0.5, result.history["test_acc"][-5:]

    # random labels -> chance
    y_rand = rng.integers(0, 5, size=n)
    cfg_short = FinetuneConfig(
        model="eegnet",
        batch_size=16,
        optimizer="adam",
        weight_decay=0.0,
        phases=(PhaseConfig(epochs=10, lr=1e-3, freeze=False),),
    )
    res2 = JitTrainer(model, cfg_short, maxnorm_rules=model.maxnorm_rules).fit(
        (x[:80], y_rand[:80], x[80:], y_rand[80:]), seed=0
    )
    assert res2.history["test_acc"][-1] < 0.45


def test_eegnet_bf16_close_to_f32(rng):
    import jax
    import jax.numpy as jnp

    x = rng.normal(size=(4, 30, 500)).astype(np.float32)
    m32 = EEGNet(dropout_rate=0.0)
    m16 = EEGNet(dropout_rate=0.0, compute_dtype=jnp.bfloat16)
    v = m32.init(jax.random.PRNGKey(0), x, train=False)
    o32 = np.asarray(m32.apply(v, x, train=False))
    o16 = np.asarray(m16.apply(v, x, train=False))
    assert o16.dtype == np.float32
    assert np.abs(o32 - o16).max() < 0.15 * np.abs(o32).max() + 0.05


def test_fft_temporal_conv_matches_direct(rng):
    """FFT correlation path == lax conv path (same params)."""
    x = rng.normal(size=(3, 30, 500)).astype(np.float32)
    m_conv = EEGNet(dropout_rate=0.0)
    m_fft = EEGNet(dropout_rate=0.0, temporal_mode="fft")
    v = m_conv.init(jax.random.PRNGKey(0), x, train=False)
    o1 = np.asarray(m_conv.apply(v, x, train=False))
    o2 = np.asarray(m_fft.apply(v, x, train=False))
    np.testing.assert_allclose(o1, o2, rtol=1e-3, atol=1e-3)


def test_fft_temporal_conv_odd_kernel(rng):
    x = rng.normal(size=(2, 8, 128)).astype(np.float32)
    m_conv = EEGNet(chans=8, samples=128, kern_length=31, dropout_rate=0.0)
    m_fft = EEGNet(
        chans=8, samples=128, kern_length=31, dropout_rate=0.0, temporal_mode="fft"
    )
    v = m_conv.init(jax.random.PRNGKey(1), x, train=False)
    o1 = np.asarray(m_conv.apply(v, x, train=False))
    o2 = np.asarray(m_fft.apply(v, x, train=False))
    np.testing.assert_allclose(o1, o2, rtol=1e-3, atol=1e-3)


def test_fit_is_deterministic(rng):
    x = rng.normal(size=(20, 4, 64)).astype(np.float32)
    y = rng.integers(0, 5, 20)
    cfg = FinetuneConfig(
        model="eegnet", batch_size=8, optimizer="adam", weight_decay=0.0,
        phases=(PhaseConfig(epochs=2, lr=1e-3, freeze=False),),
    )
    model = EEGNet(chans=4, samples=64, kern_length=8)
    a = JitTrainer(model, cfg).fit((x[:12], y[:12], x[12:], y[12:]), seed=7)
    b = JitTrainer(model, cfg).fit((x[:12], y[:12], x[12:], y[12:]), seed=7)
    np.testing.assert_array_equal(a.outputs_test, b.outputs_test)
