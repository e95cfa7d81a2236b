"""Golden-parity tests of the XLA signal ops vs scipy (the reference's DSP).

Run in float64 on CPU (the conftest forces the CPU platform); production uses
float32 on TPU.
"""

import jax
import numpy as np
import pytest
import scipy.signal as sps


from eav_tpu.ops.signal import bandpass_sos, design_butter_sos, resample_poly, sosfilt, upfirdn


@pytest.mark.parametrize("n", [1000, 2047])
@pytest.mark.parametrize("up,down", [(1, 5), (2, 3)])
def test_resample_poly_matches_scipy(rng, n, up, down):
    x = rng.normal(size=(3, n))
    ref = sps.resample_poly(x, up, down, axis=-1)
    ours = np.asarray(resample_poly(x, up, down))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-10)


def test_resample_poly_441_to_160(rng):
    # the 44.1k -> 16k production ratio, one size (8821-tap FIR is slow on
    # this 1-core host)
    x = rng.normal(size=(1, 2000))
    ref = sps.resample_poly(x, 160, 441, axis=-1)
    ours = np.asarray(resample_poly(x, 160, 441))
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-10)


def test_upfirdn_matches_scipy(rng):
    x = rng.normal(size=(517,))
    h = rng.normal(size=(31,))
    for up, down in [(1, 1), (1, 4), (3, 1), (3, 2)]:
        ref = sps.upfirdn(h, x, up=up, down=down)
        ours = np.asarray(upfirdn(h, x, up=up, down=down))
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("method", ["scan", "parallel"])
def test_sosfilt_matches_scipy(rng, method):
    sos = design_butter_sos(5, 0.5, 45.0, 100.0)
    x = rng.normal(size=(4, 5000))
    ref = sps.sosfilt(sos, x, axis=-1)
    ours = np.asarray(sosfilt(sos, x, method=method))
    np.testing.assert_allclose(ours, ref, rtol=1e-7, atol=1e-9)


def test_sosfilt_assoc_blocked_long(rng):
    # Long signal crossing many blocks; EEG-scale (ch, t*tri) row.
    sos = design_butter_sos(5, 0.5, 45.0, 100.0)
    x = rng.normal(size=(2, 60_000))
    ref = sps.sosfilt(sos, x, axis=-1)
    ours = np.asarray(sosfilt(sos, x, method="parallel", block_size=1 << 12))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-8)


def test_bandpass_end_to_end_response(rng):
    # 10 Hz tone passes the [0.5, 45] band; 49.5 Hz is strongly attenuated.
    fs = 100.0
    t = np.arange(20000) / fs
    x_pass = np.sin(2 * np.pi * 10.0 * t)
    x_stop = np.sin(2 * np.pi * 49.5 * t)
    y_pass = np.asarray(bandpass_sos(x_pass, 0.5, 45.0, fs))
    y_stop = np.asarray(bandpass_sos(x_stop, 0.5, 45.0, fs))
    assert np.std(y_pass[5000:]) > 0.5
    assert np.std(y_stop[5000:]) < 0.05


def test_float32_accuracy_is_reasonable(rng):
    # Production dtype check: f32 assoc path vs f64 scipy within 1e-3 rel.
    sos = design_butter_sos(5, 0.5, 45.0, 100.0)
    x = rng.normal(size=(30, 20000)).astype(np.float32)
    ref = sps.sosfilt(sos, x.astype(np.float64), axis=-1)
    ours = np.asarray(sosfilt(sos.astype(np.float32), x, method="parallel"))
    err = np.abs(ours - ref) / (np.abs(ref).max())
    assert err.max() < 1e-3
