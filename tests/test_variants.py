"""Reference-variant capabilities: Keras-pipeline EEG preproc order (C16),
majority-vote trial aggregation (C15), per-epoch logit history (C10)."""

import numpy as np
import pytest
import scipy.signal as sps
from scipy.stats import mode as scipy_mode

from eav_tpu.core.config import EEGPreprocConfig, FinetuneConfig, PhaseConfig
from eav_tpu.core.metrics import trial_majority_vote
from eav_tpu.ingest.eeg import DataLoadEEG
from eav_tpu.models.eegnet import EEGNet
from eav_tpu.train.loop import JitTrainer

CH, T, TRI = 4, 4000, 10


def test_filter_before_downsample_matches_keras_order(rng):
    """Oracle replicating the EEG notebook's order: Bandpass at 500 Hz on the
    F-order stream, then resample_poly (EEG_nb.ipynb cell4 semantics)."""
    seg = rng.normal(size=(CH, T, TRI))
    label = np.zeros((10, TRI))
    label[np.asarray([1, 3, 5, 7, 9] * 2), np.arange(TRI)] = 1

    cfg = EEGPreprocConfig(
        channels=CH, trial_seconds=8.0, chunk_seconds=2.0, band=(3.0, 50.0),
        filter_before_downsample=True,
    )
    x, y = DataLoadEEG(config=cfg, dtype=np.float64).prepare_from_arrays(seg, label)

    # oracle
    flat = np.reshape(seg, [CH, T * TRI], order="F")
    sos = sps.butter(5, [3.0, 50.0], btype="bandpass", fs=500, output="sos")
    filt = np.stack([sps.sosfilt(sos, flat[i]) for i in range(CH)])
    down = sps.resample_poly(filt, up=1, down=5, axis=1)
    seg_d = np.reshape(down, [CH, T // 5, TRI], order="F")
    chunk = T // 5 // 4
    tm1 = seg_d.reshape((CH, chunk, 4, TRI), order="F").reshape((CH, chunk, 4 * TRI), order="F")
    sel = [1, 3, 5, 7, 9]
    lab = np.repeat(label, 4, axis=1)
    mask = np.isin(np.argmax(lab, axis=0), sel)
    ref = np.transpose(tm1[:, :, mask], (2, 0, 1))
    np.testing.assert_allclose(x, ref, rtol=1e-7, atol=1e-9)


def test_majority_vote_matches_scipy_mode(rng):
    logits = rng.normal(size=(12 * 25, 5)).astype(np.float32)
    pred = np.asarray(trial_majority_vote(logits, 25, 5))
    frame_pred = logits.reshape(12, 25, 5).argmax(-1)
    ref = scipy_mode(frame_pred, axis=1, keepdims=False).mode
    np.testing.assert_array_equal(pred, ref)


def test_epoch_logits_history(rng):
    x = rng.normal(size=(20, 4, 64)).astype(np.float32)
    y = rng.integers(0, 5, 20)
    cfg = FinetuneConfig(
        model="eegnet", batch_size=8, optimizer="adam", weight_decay=0.0,
        phases=(PhaseConfig(epochs=3, lr=1e-3, freeze=False),),
        keep_epoch_logits=True,
    )
    model = EEGNet(chans=4, samples=64, kern_length=8, dropout_rate=0.0)
    res = JitTrainer(model, cfg).fit((x[:12], y[:12], x[12:], y[12:]), seed=0)
    assert res.epoch_logits.shape == (3, 8, 5)
    # last epoch's logits == final outputs_test
    np.testing.assert_allclose(res.epoch_logits[-1], res.outputs_test, rtol=1e-5, atol=1e-6)


def test_eegnet_keras_dense_norm():
    model = EEGNet(norm_rate=1.0, norm_rate_dense=0.25)
    rules = dict((r[0], r[1]) for r in model.maxnorm_rules)
    assert rules["head/kernel"] == 0.25
    assert rules["conv_depthwise/kernel"] == 1.0
