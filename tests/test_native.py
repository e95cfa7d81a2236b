"""Native C++ ingest library vs the pure-python oracles."""

import numpy as np
import pytest
import scipy.io

from eav_tpu.ingest import mat5, native
from eav_tpu.ingest.wav import read_wav as py_read_wav, write_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libeav_ingest.so not built"
)


def test_native_wav_matches_python(tmp_path, rng):
    x = (rng.normal(size=(2, 5000)) * 0.2).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 22050)
    ours, sr = native.read_wav(p)
    ref, sr2 = py_read_wav(p)
    assert sr == sr2 == 22050
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_native_mat_matches_scipy(tmp_path, rng):
    p = str(tmp_path / "t.mat")
    seg = rng.normal(size=(100, 6, 4))
    scipy.io.savemat(p, {"seg": seg}, do_compression=True)
    ours = native.read_mat_var(p, "seg")
    np.testing.assert_allclose(ours, seg, rtol=1e-12)
    # our own writer (uncompressed) too
    p2 = str(tmp_path / "u.mat")
    mat5.savemat(p2, {"label": seg[:10, :, 0]})
    np.testing.assert_allclose(native.read_mat_var(p2, "label"), seg[:10, :, 0])


def test_native_mat_float32(tmp_path, rng):
    p = str(tmp_path / "f.mat")
    seg = rng.normal(size=(7, 3)).astype(np.float32)
    scipy.io.savemat(p, {"seg1": seg})
    np.testing.assert_allclose(native.read_mat_var(p, "seg1"), seg, rtol=1e-6)


def test_native_missing_var_raises(tmp_path, rng):
    p = str(tmp_path / "m.mat")
    scipy.io.savemat(p, {"a": np.ones(3)})
    with pytest.raises(IOError, match="not found"):
        native.read_mat_var(p, "nope")


def test_prefetch_queue(tmp_path, rng):
    paths = []
    for i in range(8):
        x = (rng.normal(size=4000) * 0.1).astype(np.float32)
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, x, 16000)
        paths.append((p, x))
    pf = native.WavPrefetcher(n_threads=3)
    for p, _ in paths:
        pf.submit(p)
    got = {}
    for path, data, sr in pf:
        assert sr == 16000
        got[path] = data
    assert len(got) == 8
    for p, x in paths:
        np.testing.assert_allclose(got[p][0], x, atol=1.0 / 32000)
    pf.close()


def _write_clip(path, frames=60, h=120, w=160):
    import cv2

    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    yy, xx = np.mgrid[0:h, 0:w]
    for f in range(frames):
        img = np.stack(
            [(xx * 2 + f * 4) % 256, (yy * 2) % 256, ((xx + yy) + f * 2) % 256],
            axis=-1,
        ).astype(np.uint8)
        vw.write(img)
    vw.release()


def test_native_mp4_matches_cv2(tmp_path):
    """The libav strided decoder returns the same frames as the cv2 grab
    loop (`Dataload_vision.py:49-62` semantics): frames 0, 6, 12, ... Both
    stacks route through ffmpeg, so outputs are bit-exact in practice; allow
    a tiny tolerance for swscale rounding differences across versions."""
    if not native.mp4_supported():
        pytest.skip("built without libav")
    from eav_tpu.ingest.video import decode_strided_frames

    p = tmp_path / "clip.mp4"
    _write_clip(p)
    a = np.stack(decode_strided_frames(str(p), 6, 60, backend="native"))
    b = np.stack(decode_strided_frames(str(p), 6, 60, backend="cv2"))
    assert a.shape == b.shape == (10, 120, 160, 3)
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.mean() < 1.0 and np.percentile(diff, 99) <= 4


def test_native_mp4_truncated_file_fails_cleanly(tmp_path):
    if not native.mp4_supported():
        pytest.skip("built without libav")
    p = tmp_path / "bad.mp4"
    p.write_bytes(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64)
    with pytest.raises(IOError):
        native.read_mp4_strided(str(p), 6, 60)
