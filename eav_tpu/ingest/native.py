"""ctypes bindings for the native ingest library (ingest/cpp/eav_ingest.cc).

Loads ``libeav_ingest.so`` if present (``make -C eav_tpu/ingest/cpp``; the
build is attempted once automatically), else ``available()`` is False and
callers fall back to the pure-python readers (ingest/mat5.py, ingest/wav.py),
which double as the correctness oracle in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_SO = os.path.join(_DIR, "libeav_ingest.so")
_lib = None
_tried_build = False


def _make(force: bool = False) -> bool:
    try:
        cmd = ["make", "-C", _DIR] + (["-B"] if force else [])
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _has_symbol(path: str, name: bytes) -> bool:
    """Cheap pre-dlopen symbol probe: dynsym names are plain bytes in the
    ELF. Rebuilding a library AFTER dlopen is unsafe (glibc caches by inode,
    so a reload returns the stale mapping; relinking over a mapped file can
    SIGBUS live calls) — so staleness must be detected before loading."""
    try:
        with open(path, "rb") as f:
            return name in f.read()
    except OSError:
        return False


def _load():
    global _lib, _tried_build
    if _lib is not None:
        return _lib
    if not _tried_build and (
        not os.path.exists(_SO) or not _has_symbol(_SO, b"eav_mp4_supported")
    ):
        # missing, or a stale pre-mp4-ABI build: (re)build BEFORE any dlopen
        _tried_build = True
        _make(force=os.path.exists(_SO))
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.eav_last_error.restype = ctypes.c_char_p
    lib.eav_read_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.eav_read_mat_var.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.eav_free.argtypes = [ctypes.c_void_p]
    lib.eav_prefetch_create.restype = ctypes.c_void_p
    lib.eav_prefetch_create.argtypes = [ctypes.c_int]
    lib.eav_prefetch_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.eav_prefetch_pop.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.eav_prefetch_destroy.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "eav_mp4_supported"):
        lib.eav_mp4_supported.restype = ctypes.c_int
        lib.eav_mp4_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.eav_read_mp4_strided_into.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib._eav_has_mp4 = bool(lib.eav_mp4_supported())
    else:  # stale pre-mp4 .so and the rebuild failed: WAV/mat still work
        lib._eav_has_mp4 = False
    _lib = lib
    return lib



def _copy_native(ptr, ctype, count: int, dtype) -> np.ndarray:
    """memcpy a malloc'd native buffer into a fresh numpy array.

    np.ctypeslib.as_array(pointer, shape).copy() degrades to ~80 MB/s
    element-wise conversion on large buffers (measured: 3.5 s for a 276 MB
    frame stack); np.frombuffer over the ctypes array view is a true memcpy.
    """
    view = ctypes.cast(ptr, ctypes.POINTER(ctype * count)).contents
    return np.frombuffer(view, dtype=dtype, count=count).copy()

def available() -> bool:
    return _load() is not None


def _last_error(lib) -> str:
    return lib.eav_last_error().decode()


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Native WAV decode: (channels, samples) float32 + sample rate."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library not built")
    data = ctypes.POINTER(ctypes.c_float)()
    channels = ctypes.c_int()
    samples = ctypes.c_long()
    rate = ctypes.c_int()
    rc = lib.eav_read_wav(
        path.encode(), ctypes.byref(data), ctypes.byref(channels),
        ctypes.byref(samples), ctypes.byref(rate),
    )
    if rc != 0:
        raise IOError(_last_error(lib))
    n = channels.value * samples.value
    out = _copy_native(data, ctypes.c_float, n, np.float32).reshape(
        channels.value, samples.value
    )
    lib.eav_free(data)
    return out, rate.value


def read_mat_var(path: str, name: str) -> np.ndarray:
    """Native .mat numeric variable read -> float64 array (MATLAB shape)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library not built")
    data = ctypes.POINTER(ctypes.c_double)()
    dims = ctypes.POINTER(ctypes.c_int64)()
    ndims = ctypes.c_int()
    rc = lib.eav_read_mat_var(
        path.encode(), name.encode(), ctypes.byref(data), ctypes.byref(dims),
        ctypes.byref(ndims),
    )
    if rc != 0:
        raise IOError(_last_error(lib))
    shape = tuple(dims[i] for i in range(ndims.value))
    total = int(np.prod(shape))
    flat = _copy_native(data, ctypes.c_double, total, np.float64)
    lib.eav_free(data)
    lib.eav_free(dims)
    return flat.reshape(shape, order="F")


def mp4_supported() -> bool:
    lib = _load()
    return bool(lib is not None and lib._eav_has_mp4)


def read_mp4_strided(path: str, stride: int = 6, max_frames: int = 600) -> np.ndarray:
    """Native libav decode of frames 0, stride, ... < max_frames ->
    (n, H, W, 3) uint8 RGB. Decodes every frame (inter-frame codecs) but
    color-converts only the kept ones, entirely outside the GIL — thread
    pools over this call scale (ingest/video.py).

    The decoder writes directly into a pre-allocated numpy buffer
    (eav_read_mp4_strided_into): a second copy of the frame stack would cost
    seconds by itself on hosts with slow first-touch memory (a 100-clip
    subject at 720p is ~28 GB of frames before caching)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library not built")
    if not lib._eav_has_mp4:
        raise RuntimeError("native library built without mp4 support")
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.eav_mp4_probe(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise IOError(_last_error(lib))
    cap = (max_frames + stride - 1) // stride
    probe_h, probe_w = h.value, w.value
    out = np.empty((cap, probe_h, probe_w, 3), np.uint8)
    n = ctypes.c_int()
    rc = lib.eav_read_mp4_strided_into(
        path.encode(), stride, max_frames,
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(out.nbytes),
        ctypes.byref(n), ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise IOError(_last_error(lib))
    if (h.value, w.value) != (probe_h, probe_w):
        # probe and decoder use identical stream selection, so this only
        # fires on genuinely inconsistent headers — fail, never return
        # frames reshaped with the wrong geometry
        raise IOError(
            f"decoded dims {h.value}x{w.value} != probed {probe_h}x{probe_w}"
        )
    return out[: n.value]


class WavPrefetcher:
    """Threaded native decode queue: submit paths, iterate results in
    completion order while the device computes."""

    def __init__(self, n_threads: int = 4):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native ingest library not built")
        self._q = self._lib.eav_prefetch_create(n_threads)
        self._pending = 0

    def submit(self, path: str) -> None:
        self._lib.eav_prefetch_submit(self._q, path.encode())
        self._pending += 1

    def pop(self) -> Tuple[str, np.ndarray, int]:
        if self._pending <= 0:
            raise RuntimeError("no pending jobs")
        buf = ctypes.create_string_buffer(4096)
        data = ctypes.POINTER(ctypes.c_float)()
        channels = ctypes.c_int()
        samples = ctypes.c_long()
        rate = ctypes.c_int()
        rc = self._lib.eav_prefetch_pop(
            self._q, buf, 4096, ctypes.byref(data), ctypes.byref(channels),
            ctypes.byref(samples), ctypes.byref(rate),
        )
        self._pending -= 1
        path = buf.value.decode()
        if rc != 0:
            raise IOError(f"{path}: {_last_error(self._lib)}")
        n = channels.value * samples.value
        out = _copy_native(data, ctypes.c_float, n, np.float32).reshape(
            channels.value, samples.value
        )
        self._lib.eav_free(data)
        return path, out, rate.value

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray, int]]:
        while self._pending > 0:
            yield self.pop()

    def close(self) -> None:
        if self._q is not None:
            self._lib.eav_prefetch_destroy(self._q)
            self._q = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
