"""EEG ingest parity: our fused XLA pipeline vs an oracle that replicates the
reference `Dataload_eeg.py` chain (scipy + MATLAB F-order reshapes) verbatim.
"""

import numpy as np
import pytest
import scipy.io
import scipy.signal as sps

import jax


from eav_tpu.core.config import EEGPreprocConfig
from eav_tpu.ingest import mat5
from eav_tpu.ingest.eeg import (
    DataLoadEEG,
    chunk_trials,
    flatten_trials,
    preprocess_eeg,
    select_classes,
    unflatten_trials,
)

CH, T, TRI = 6, 4000, 10  # scaled-down (real: 30, 10000, 200)


def _oracle(seg, label, band=(0.5, 45.0), fs_orig=500, fs_target=100):
    """Verbatim re-creation of Dataload_eeg.py:85-152 semantics (with the
    label remap fix, see ingest/eeg.py docstring)."""
    ch, t, tri = seg.shape
    # downsampling (:94-102)
    tm = np.reshape(seg, [ch, t * tri], order="F")
    tm2 = sps.resample_poly(tm, up=1, down=fs_orig // fs_target, axis=1)
    new_t = t * fs_target // fs_orig
    seg_d = np.reshape(tm2, [ch, new_t, tri], order="F")
    # bandpass (:104-121)
    dat = np.reshape(seg_d, [ch, new_t * tri], order="F")
    sos = sps.butter(5, band, btype="bandpass", fs=fs_target, output="sos")
    fdat = [sps.sosfilt(sos, dat[i]) for i in range(ch)]
    seg_f = np.array(fdat).reshape((ch, new_t, tri), order="F")
    # segment into 4 chunks (:133-139)
    chunk = new_t // 4
    tm1 = seg_f.reshape((ch, chunk, 4, tri), order="F")
    seg_div = tm1.reshape((ch, chunk, 4 * tri), order="F")
    label_div = np.repeat(label, repeats=4, axis=1)
    # class select (:142-152) + remap
    selected = [1, 3, 5, 7, 9]
    mask = np.isin(np.argmax(label_div, axis=0), selected)
    lab = np.argmax(label_div[:, mask], axis=0)
    lab = np.array([selected.index(v) for v in lab])
    x = np.transpose(seg_div[:, :, mask], (2, 0, 1))
    return x, lab


@pytest.fixture
def synthetic_subject(rng):
    seg = rng.normal(size=(CH, T, TRI)).astype(np.float64)
    onehot_rows = rng.integers(0, 10, size=TRI)
    label = np.zeros((10, TRI))
    label[onehot_rows, np.arange(TRI)] = 1
    return seg, label


def test_forder_reshape_helpers(rng):
    x = rng.normal(size=(3, 20, 4))
    flat = np.asarray(flatten_trials(x))
    ref = np.reshape(x, [3, 80], order="F")
    np.testing.assert_array_equal(flat, ref)
    back = np.asarray(unflatten_trials(flat, 20))
    np.testing.assert_array_equal(back, x)
    # chunking: (ch, t, tri) -> (ch, t/4, 4*tri) F-order semantics
    ch4 = np.asarray(chunk_trials(x, 5))
    ref4 = x.reshape((3, 5, 4, 4), order="F").reshape((3, 5, 16), order="F")
    np.testing.assert_array_equal(ch4, ref4)


def test_full_pipeline_matches_oracle(rng, synthetic_subject):
    seg, label = synthetic_subject
    cfg = EEGPreprocConfig(channels=CH, trial_seconds=8.0, chunk_seconds=2.0)
    loader = DataLoadEEG(config=cfg, dtype=np.float64)
    x, y = loader.prepare_from_arrays(seg, label)
    x_ref, y_ref = _oracle(seg, label)
    np.testing.assert_array_equal(y, y_ref)
    assert x.shape == x_ref.shape
    np.testing.assert_allclose(x, x_ref, rtol=1e-7, atol=1e-9)


def test_pipeline_float32_close(rng, synthetic_subject):
    seg, label = synthetic_subject
    cfg = EEGPreprocConfig(channels=CH, trial_seconds=8.0, chunk_seconds=2.0)
    x32, _ = DataLoadEEG(config=cfg, dtype=np.float32).prepare_from_arrays(
        seg.astype(np.float32), label
    )
    x_ref, _ = _oracle(seg, label)
    scale = np.abs(x_ref).max()
    assert (np.abs(x32 - x_ref) / scale).max() < 2e-3


def test_select_classes_remaps_labels(rng):
    data = rng.normal(size=(2, 5, 8))
    onehot = np.zeros((10, 8))
    rows = [0, 1, 3, 5, 7, 9, 2, 9]
    onehot[rows, np.arange(8)] = 1
    x, y = select_classes(data, onehot, (1, 3, 5, 7, 9))
    assert x.shape == (6, 2, 5)
    np.testing.assert_array_equal(y, [0, 1, 2, 3, 4, 4])


def test_mat5_roundtrip_and_scipy_compat(tmp_path, rng):
    path = str(tmp_path / "t.mat")
    seg = rng.normal(size=(100, 6, 4))
    label = rng.integers(0, 2, size=(10, 4)).astype(np.float64)
    mat5.savemat(path, {"seg": seg, "label": label})
    ours = mat5.loadmat(path)
    np.testing.assert_array_equal(ours["seg"], seg)
    np.testing.assert_array_equal(ours["label"], label)
    ref = scipy.io.loadmat(path)
    np.testing.assert_array_equal(ref["seg"], seg)
    np.testing.assert_array_equal(ref["label"], label)


def test_mat5_reads_scipy_written_compressed(tmp_path, rng):
    path = str(tmp_path / "c.mat")
    seg = rng.normal(size=(50, 3, 2)).astype(np.float32)
    scipy.io.savemat(path, {"seg1": seg}, do_compression=True)
    ours = mat5.loadmat(path)
    np.testing.assert_allclose(ours["seg1"], seg)


def test_dataload_end_to_end_from_mat(tmp_path, rng):
    root = tmp_path / "EAV"
    sdir = root / "subject01" / "EEG"
    sdir.mkdir(parents=True)
    seg_tch = rng.normal(size=(T, CH, TRI))  # .mat layout (t, ch, tri)
    label = np.zeros((10, TRI))
    label[rng.integers(0, 10, TRI), np.arange(TRI)] = 1
    mat5.savemat(str(sdir / "subject01_eeg.mat"), {"seg": seg_tch})
    mat5.savemat(str(sdir / "subject01_eeg_label.mat"), {"label": label})
    loader = DataLoadEEG(
        subject=1,
        config=EEGPreprocConfig(channels=CH, trial_seconds=8.0, chunk_seconds=2.0),
        parent_directory=str(root),
        dtype=np.float64,
    )
    x, y = loader.prepare_data()
    x_ref, y_ref = _oracle(np.transpose(seg_tch, (1, 0, 2)), label)
    np.testing.assert_allclose(x, x_ref, rtol=1e-7, atol=1e-9)
    np.testing.assert_array_equal(y, y_ref)
