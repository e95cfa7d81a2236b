"""Vision ingest: .mp4 -> (samples, 25, H, W, 3) uint8 frame stacks + labels.

Behavioral equivalent of the reference ``DataLoadVision``
(`Dataload_vision.py:9-99`): Speaking clips only, every 6th frame of the
first 600 (100 frames per 20 s clip), grouped 25 frames = 5 s per sample,
labels from filename token 4.

TPU-first restructure: the reference runs MTCNN *inside* the cv2 decode loop
(one frame at a time, `Dataload_vision.py:63-74` — the pipeline's worst
bottleneck, SURVEY.md §3.2). Here decode is a pure host loop producing a
frame batch, and face detection runs afterwards as batched device inference
(models/mtcnn.py), or a documented center-crop fallback when MTCNN weights
are not available (they are not vendored; neither are the reference's).
The reference's "no face found -> append anyway" latent bug
(`Dataload_vision.py:71-73`) is fixed by always producing a crop.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import numpy as np

from eav_tpu.core.config import EMOTION_TO_INDEX, VisionPreprocConfig


def decode_strided_frames(
    path: str, stride: int = 6, max_frames: int = 600, backend: str = "auto"
) -> List[np.ndarray]:
    """RGB frames 0, stride, 2*stride, ... < max_frames (reference
    `Dataload_vision.py:49-62` keeps frame_index-1 % 6 == 0).

    ``backend='auto'`` prefers the native libav decoder
    (ingest/cpp eav_read_mp4_strided: GIL-free, converts only kept frames);
    ``'cv2'`` forces the cv2 fallback, whose skipped frames are ``grab()``-ed
    only (decoded but never retrieved or color-converted). Measured
    (scripts/bench_video_decode.py, 60x600-frame 320x240 mp4v clips, 1-core
    host): native 3.58 clips/s ~= cv2 read-everything 3.69; the cv2
    grab/retrieve split measured SLOWER there (2.48) — codec decode
    dominates at that resolution, and conversion skipping pays off only at
    higher resolutions. Decode is CPU-bound: the threaded pool scales with
    host cores (both backends release the GIL), not on a 1-core host."""
    if backend in ("auto", "native"):
        try:
            from eav_tpu.ingest import native

            if native.mp4_supported():
                arr = native.read_mp4_strided(path, stride, max_frames)
                return list(arr)
            if backend == "native":
                raise RuntimeError(
                    "backend='native' requested but the ingest library was "
                    "built without libav"
                )
        except Exception as e:
            if backend == "native":
                raise
            # A genuine native decode failure (corrupt file, geometry
            # mismatch) must not become silent data truncation: surface it
            # before retrying with cv2, which will raise its own IOError if
            # the file really is unreadable.
            import warnings

            warnings.warn(
                f"native mp4 decode failed for {path} ({type(e).__name__}: {e}); "
                "falling back to cv2",
                RuntimeWarning,
                stacklevel=2,
            )
    import cv2

    cap = cv2.VideoCapture(path)
    frames: List[np.ndarray] = []
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    idx = 0
    while idx < max_frames:
        if idx % stride == 0:
            ret, frame = cap.read()
            if not ret:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        elif not cap.grab():
            break
        idx += 1
    cap.release()
    return frames


def decode_clips_threaded(
    paths: List[str],
    stride: int = 6,
    max_frames: int = 600,
    workers: Optional[int] = None,
    prefetch: Optional[int] = None,
):
    """Decode many clips concurrently, yielding (path, frames) in input
    order. Both the native libav reader (a ctypes call) and cv2's FFmpeg
    backend release the GIL, so N worker threads scale with host cores AND
    overlap the next clips' decode with the consumer's crop/MTCNN/device
    work even on one core — the threaded equivalent of the native WAV
    prefetch queue (SURVEY.md §2.2 mp4 row), kept in Python because the
    decoder itself is native.

    In-flight clips are bounded by ``prefetch`` (default workers + 1):
    unbounded submission would buffer every decoded clip's frames ahead of
    the consumer (~GBs for a 100-clip subject) and thrash host memory."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    if workers is None:
        workers = min(8, os.cpu_count() or 1)
    if prefetch is None:
        prefetch = workers + 1
    it = iter(paths)
    with ThreadPoolExecutor(workers) as ex:
        pending: deque = deque()

        def top_up():
            while len(pending) < prefetch:
                try:
                    p = next(it)
                except StopIteration:
                    return
                pending.append((p, ex.submit(decode_strided_frames, p, stride, max_frames)))

        top_up()
        while pending:
            p, fut = pending.popleft()
            top_up()  # keep workers fed before blocking on this result
            yield p, fut.result()


def center_crop_resize(frames: np.ndarray, size: int) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, size, size, 3): square center crop + cv2
    resize. The no-weights fallback face path (faces are centered in EAV
    recordings)."""
    import cv2

    n, h, w, _ = frames.shape
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    out = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        out[i] = cv2.resize(frames[i, y0 : y0 + s, x0 : x0 + s], (size, size))
    return out


def resize_frames(frames: np.ndarray, size: int) -> np.ndarray:
    import cv2

    n = frames.shape[0]
    out = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        out[i] = cv2.resize(frames[i], (size, size))
    return out


class DataLoadVision:
    """Public interface parity (`Dataload_vision.py:96-99`):
    ``process() -> (images, image_label_idx)`` with images
    (samples, frames_per_sample, H, W, 3) uint8."""

    def __init__(
        self,
        subject: int = 1,
        parent_directory: str = "./Datasets/EAV",
        config: VisionPreprocConfig = VisionPreprocConfig(),
        face_cropper: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ):
        self.subject = subject
        self.parent_directory = parent_directory
        self.cfg = config
        self._face_cropper = face_cropper

    def data_files(self) -> List[str]:
        path = os.path.join(self.parent_directory, f"subject{self.subject:02d}", "Video")
        return [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if "Speaking" in f and f.endswith(".mp4")
        ]

    def _crop(self, frames: np.ndarray) -> np.ndarray:
        cfg = self.cfg
        if not cfg.face_detection:
            return resize_frames(frames, cfg.image_size)
        if self._face_cropper is not None:
            return self._face_cropper(frames)
        try:
            from eav_tpu.models.mtcnn import default_face_cropper

            cropper = default_face_cropper(cfg)
            if cropper is not None:
                self._face_cropper = cropper
                return cropper(frames)
        except Exception:
            pass
        return center_crop_resize(frames, cfg.face_image_size)

    def process(self) -> Tuple[np.ndarray, np.ndarray]:
        cfg = self.cfg
        samples, labels = [], []
        for path, frames in decode_clips_threaded(
            self.data_files(), cfg.frame_stride, cfg.max_frames
        ):
            emotion = os.path.basename(path).split("_")[4].split(".")[0]
            if not frames:
                continue
            frames = self._crop(np.stack(frames))
            n_groups = len(frames) // cfg.frames_per_sample
            for g in range(n_groups):
                samples.append(
                    frames[g * cfg.frames_per_sample : (g + 1) * cfg.frames_per_sample]
                )
                labels.append(EMOTION_TO_INDEX[emotion])
        return np.stack(samples), np.asarray(labels, np.int32)
