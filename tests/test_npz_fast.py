"""fast_npz_load == np.load on every layout np.savez can produce.

The loader exists because np.load's zipfile path reads a 1.5 GB vision cache
at ~15 MB/s on the 1-core host (measured 101 s) while the mmap path opens it
in <1 s — see eav_tpu/ingest/npz.py docstring.
"""

import numpy as np
import pytest

from eav_tpu.ingest.npz import fast_npz_load


def _roundtrip(tmp_path, save, **arrays):
    path = str(tmp_path / "a.npz")
    save(path, **arrays)
    ref = np.load(path)
    got = fast_npz_load(path)
    assert set(got) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(got[k], ref[k])
        assert got[k].dtype == ref[k].dtype
    return got


def test_stored_members_match_and_are_views(tmp_path):
    x = np.random.default_rng(0).integers(0, 256, size=(7, 5, 4, 3), dtype=np.uint8)
    y = np.arange(7, dtype=np.int32)
    f = np.asfortranarray(np.random.default_rng(1).normal(size=(6, 8)))
    got = _roundtrip(tmp_path, np.savez, x=x, y=y, f=f)
    # zero-copy: stored members must be read-only views, not materialized copies
    assert not got["x"].flags.writeable
    assert got["x"].base is not None


def test_scalar_and_zero_dim(tmp_path):
    _roundtrip(tmp_path, np.savez, s=np.float32(3.5), z=np.zeros(()))


def test_compressed_fallback(tmp_path):
    x = np.random.default_rng(2).normal(size=(32, 16)).astype(np.float32)
    _roundtrip(tmp_path, np.savez_compressed, x=x, y=np.arange(4))


def test_empty_array(tmp_path):
    _roundtrip(tmp_path, np.savez, e=np.zeros((0, 5), dtype=np.float64))


def test_slicing_views_behaves_like_ndarray(tmp_path):
    x = np.random.default_rng(3).normal(size=(10, 3)).astype(np.float32)
    path = str(tmp_path / "a.npz")
    np.savez(path, x=x)
    got = fast_npz_load(path)["x"]
    np.testing.assert_allclose(np.concatenate([got[:4], got[7:]]), np.concatenate([x[:4], x[7:]]))
    with pytest.raises(ValueError):
        got[0, 0] = 1.0  # read-only by design


def test_pipeline_cache_roundtrip(tmp_path):
    """_cached's write (np.savez) -> read (fast_npz_load) roundtrip: the
    second call must return byte-identical arrays from the mmap path."""
    from eav_tpu.train.pipeline import _cached

    rng = np.random.default_rng(4)
    x = rng.integers(0, 256, size=(3, 2, 8, 8, 3), dtype=np.uint8)
    y = np.arange(3, dtype=np.int32)
    calls = []

    def compute():
        calls.append(1)
        return x, y

    first = _cached(str(tmp_path), "s01_t", compute)
    second = _cached(str(tmp_path), "s01_t", compute)
    assert len(calls) == 1  # second call served from cache
    np.testing.assert_array_equal(second[0], first[0])
    np.testing.assert_array_equal(second[1], first[1])


def test_object_members_refused(tmp_path):
    """Pickled members must raise, matching np.load's allow_pickle=False
    default — a tampered shared-cache file must not execute pickle payloads."""
    path = str(tmp_path / "o.npz")
    np.savez(path, o=np.array([{"a": 1}], dtype=object))
    with pytest.raises(ValueError):
        fast_npz_load(path)


def test_large_header_member(tmp_path):
    """Structured dtypes can push the .npy header past 4 KB; the parser must
    honor the declared header length, not a fixed cap."""
    dt = np.dtype([(f"f{i:03d}", np.float32) for i in range(400)])
    x = np.zeros(3, dtype=dt)
    path = str(tmp_path / "s.npz")
    np.savez(path, x=x)
    got = fast_npz_load(path)["x"]
    ref = np.load(path)["x"]
    assert got.dtype == ref.dtype
    np.testing.assert_array_equal(got, ref)


def test_zero_dim_returns_ndarray(tmp_path):
    path = str(tmp_path / "z.npz")
    np.savez(path, s=np.float32(3.5))
    got = fast_npz_load(path)["s"]
    assert isinstance(got, np.ndarray) and got.shape == ()
    assert got[()] == np.float32(3.5)
