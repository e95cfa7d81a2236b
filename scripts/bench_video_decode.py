"""Measure mp4 ingest throughput: reference-style serial read-everything
loop vs the grab-strided decoder vs the threaded multi-clip pipeline
(VERDICT round-1 missing #7 / SURVEY.md §2.2 mp4 row).

Usage: python scripts/bench_video_decode.py [--clips 100] [--wh 320x240]
Prints one JSON line per variant: {"variant", "clips_per_s", "speedup"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_clips(n: int, w: int, h: int, frames: int = 600) -> list:
    import cv2

    d = tempfile.mkdtemp(prefix="eav_vidbench_")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    paths = []
    for i in range(n):
        p = os.path.join(d, f"clip{i:03d}.mp4")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
        for f in range(frames):
            vw.write(np.roll(base, 3 * f + i, axis=1))
        vw.release()
        paths.append(p)
    return paths


def reference_read_loop(path: str, stride: int = 6, max_frames: int = 600):
    """The reference's decode: read+convert EVERY frame, keep every 6th
    (`Dataload_vision.py:49-62`)."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    idx = 0
    while idx < max_frames:
        ret, frame = cap.read()
        if not ret:
            break
        if idx % stride == 0:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        idx += 1
    cap.release()
    return frames


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=100)
    ap.add_argument("--wh", default="320x240")
    ap.add_argument("--frames", type=int, default=600)
    args = ap.parse_args(argv)
    w, h = (int(v) for v in args.wh.split("x"))

    from eav_tpu.ingest.video import decode_clips_threaded, decode_strided_frames

    paths = make_clips(args.clips, w, h, args.frames)
    print(
        f"# {args.clips} clips, {w}x{h}, {args.frames} frames each, "
        f"{os.cpu_count()} host cores",
        file=sys.stderr,
    )

    from eav_tpu.ingest import native

    results = {}

    t0 = time.perf_counter()
    n_frames = sum(len(reference_read_loop(p)) for p in paths)
    results["reference_serial"] = len(paths) / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    n2 = sum(len(decode_strided_frames(p, backend="cv2")) for p in paths)
    results["grab_serial"] = len(paths) / (time.perf_counter() - t0)

    counts = [n_frames, n2]
    if native.mp4_supported():
        t0 = time.perf_counter()
        counts.append(
            sum(len(decode_strided_frames(p, backend="native")) for p in paths)
        )
        results["native_serial"] = len(paths) / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    counts.append(sum(len(f) for _, f in decode_clips_threaded(paths)))
    results["threaded"] = len(paths) / (time.perf_counter() - t0)

    assert len(set(counts)) == 1, counts
    base = results["reference_serial"]
    for k, v in results.items():
        print(json.dumps({"variant": k, "clips_per_s": round(v, 2),
                          "speedup": round(v / base, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
