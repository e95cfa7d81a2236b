"""MTCNN face detection (P-Net / R-Net / O-Net) in Flax.

The reference calls facenet_pytorch's MTCNN per frame inside the decode loop
(`Dataload_vision.py:25-29,63-74`). Here the three cascade CNNs are Flax
modules (architecture identical to facenet_pytorch, so its public weights
import mechanically), and detection runs batched: P-Net densely over a fixed
image pyramid (factor 0.709, min size 20 — `Dataload_vision.py:27`), host
NMS between stages (ingest-time code, runs once per subject), R-Net/O-Net on
gathered crops, final aligned 56x56 crop with facenet's post-processing
((x - 127.5) / 128, re-expanded to uint8 like `Dataload_vision.py:67-69`).

Weights are NOT vendored (facenet_pytorch is not installed in this image and
egress is disabled). ``default_face_cropper`` returns a detector when weight
files are present under ``EAV_TPU_MTCNN_WEIGHTS`` (pnet.npz/rnet.npz/onet.npz
or facenet_pytorch .pt files), else None — ingest/video.py then uses the
documented center-crop fallback.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from eav_tpu.core.config import VisionPreprocConfig


class PReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (self.features,), jnp.float32)
        return jnp.where(x >= 0, x, alpha * x)


def _pool_ceil(x, window, stride):
    """MaxPool with ceil_mode=True (torch MTCNN uses ceil pooling)."""
    h, w = x.shape[1], x.shape[2]
    pad_h = (-(h - window) % stride) if h > window else 0
    pad_w = (-(w - window) % stride) if w > window else 0
    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=((0, pad_h), (0, pad_w)),
    )


class PNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = PReLU(10, name="prelu1")(nn.Conv(10, (3, 3), padding="VALID", name="conv1")(x))
        x = _pool_ceil(x, 2, 2)
        x = PReLU(16, name="prelu2")(nn.Conv(16, (3, 3), padding="VALID", name="conv2")(x))
        x = PReLU(32, name="prelu3")(nn.Conv(32, (3, 3), padding="VALID", name="conv3")(x))
        prob = nn.softmax(nn.Conv(2, (1, 1), name="conv4_1")(x), axis=-1)
        reg = nn.Conv(4, (1, 1), name="conv4_2")(x)
        return prob, reg


class RNet(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B, 24, 24, 3)
        x = PReLU(28, name="prelu1")(nn.Conv(28, (3, 3), padding="VALID", name="conv1")(x))
        x = _pool_ceil(x, 3, 2)
        x = PReLU(48, name="prelu2")(nn.Conv(48, (3, 3), padding="VALID", name="conv2")(x))
        x = _pool_ceil(x, 3, 2)
        x = PReLU(64, name="prelu3")(nn.Conv(64, (2, 2), padding="VALID", name="conv3")(x))
        # torch flattens NCHW: (B, C, H, W) -> transpose to match
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = PReLU(128, name="prelu4")(nn.Dense(128, name="dense4")(x))
        prob = nn.softmax(nn.Dense(2, name="dense5_1")(x), axis=-1)
        reg = nn.Dense(4, name="dense5_2")(x)
        return prob, reg


class ONet(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B, 48, 48, 3)
        x = PReLU(32, name="prelu1")(nn.Conv(32, (3, 3), padding="VALID", name="conv1")(x))
        x = _pool_ceil(x, 3, 2)
        x = PReLU(64, name="prelu2")(nn.Conv(64, (3, 3), padding="VALID", name="conv2")(x))
        x = _pool_ceil(x, 3, 2)
        x = PReLU(64, name="prelu3")(nn.Conv(64, (3, 3), padding="VALID", name="conv3")(x))
        x = _pool_ceil(x, 2, 2)
        x = PReLU(128, name="prelu4")(nn.Conv(128, (2, 2), padding="VALID", name="conv4")(x))
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = PReLU(256, name="prelu5")(nn.Dense(256, name="dense5")(x))
        prob = nn.softmax(nn.Dense(2, name="dense6_1")(x), axis=-1)
        reg = nn.Dense(4, name="dense6_2")(x)
        landmarks = nn.Dense(10, name="dense6_3")(x)
        return prob, reg, landmarks


def nms_numpy(boxes: np.ndarray, scores: np.ndarray, threshold: float, method: str = "union") -> np.ndarray:
    """Greedy NMS (host-side, between cascade stages)."""
    if len(boxes) == 0:
        return np.empty(0, np.int64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        if method == "min":
            iou = inter / np.minimum(area[i], area[order[1:]])
        else:
            iou = inter / (area[i] + area[order[1:]] - inter)
        order = order[1:][iou <= threshold]
    return np.asarray(keep, np.int64)


def _square(boxes: np.ndarray) -> np.ndarray:
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    s = np.maximum(w, h)
    out = boxes.copy()
    out[:, 0] = boxes[:, 0] + w * 0.5 - s * 0.5
    out[:, 1] = boxes[:, 1] + h * 0.5 - s * 0.5
    out[:, 2] = out[:, 0] + s
    out[:, 3] = out[:, 1] + s
    return out


def _apply_regression(boxes: np.ndarray, reg: np.ndarray) -> np.ndarray:
    w = (boxes[:, 2] - boxes[:, 0] + 1)[:, None]
    h = (boxes[:, 3] - boxes[:, 1] + 1)[:, None]
    return boxes + np.concatenate([w, h, w, h], axis=1) * reg


def crop_resize(image: np.ndarray, box: np.ndarray, size: int) -> np.ndarray:
    """uint8 (H, W, 3) -> (size, size, 3) via clipped crop + bilinear resize."""
    h, w = image.shape[:2]
    x1, y1, x2, y2 = [int(round(v)) for v in box]
    x1, y1 = max(0, x1), max(0, y1)
    x2, y2 = min(w, max(x2, x1 + 1)), min(h, max(y2, y1 + 1))
    crop = image[y1:y2, x1:x2].astype(np.float32)
    out = jax.image.resize(jnp.asarray(crop), (size, size, 3), "bilinear", antialias=True)
    return np.asarray(out)


class MTCNNDetector:
    """Batched cascade. Returns aligned face crops + detection probabilities."""

    def __init__(
        self,
        params_pnet,
        params_rnet,
        params_onet,
        min_face_size: int = 20,
        thresholds: Tuple[float, float, float] = (0.6, 0.7, 0.7),
        factor: float = 0.709,
        face_size: int = 56,
    ):
        self.pnet, self.rnet, self.onet = PNet(), RNet(), ONet()
        self.params = (params_pnet, params_rnet, params_onet)
        self.min_face_size = min_face_size
        self.thresholds = thresholds
        self.factor = factor
        self.face_size = face_size
        self._pnet_apply = jax.jit(lambda p, x: self.pnet.apply({"params": p}, x))
        self._rnet_apply = jax.jit(lambda p, x: self.rnet.apply({"params": p}, x))
        self._onet_apply = jax.jit(lambda p, x: self.onet.apply({"params": p}, x))

    @staticmethod
    def _norm(x: np.ndarray) -> np.ndarray:
        return (x.astype(np.float32) - 127.5) / 128.0

    def _scales(self, h: int, w: int) -> List[float]:
        m = 12.0 / self.min_face_size
        minl = min(h, w) * m
        scales, s = [], m
        while minl >= 12:
            scales.append(s)
            s *= self.factor
            minl *= self.factor
        return scales

    def _stage1(self, image: np.ndarray) -> np.ndarray:
        h, w = image.shape[:2]
        all_boxes = []
        for scale in self._scales(h, w):
            hs, ws = int(np.ceil(h * scale)), int(np.ceil(w * scale))
            if hs < 12 or ws < 12:
                continue
            img_s = np.asarray(
                jax.image.resize(jnp.asarray(image, jnp.float32), (hs, ws, 3), "bilinear")
            )
            prob, reg = self._pnet_apply(self.params[0], self._norm(img_s)[None])
            prob = np.asarray(prob)[0, ..., 1]
            reg = np.asarray(reg)[0]
            ys, xs = np.where(prob > self.thresholds[0])
            if len(ys) == 0:
                continue
            stride, cell = 2.0, 12.0
            x1 = np.round(xs * stride / scale)
            y1 = np.round(ys * stride / scale)
            x2 = np.round((xs * stride + cell) / scale)
            y2 = np.round((ys * stride + cell) / scale)
            boxes = np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)
            scores = prob[ys, xs]
            r = reg[ys, xs]
            keep = nms_numpy(boxes, scores, 0.5)
            boxes, scores, r = boxes[keep], scores[keep], r[keep]
            boxes = _apply_regression(boxes, r)
            all_boxes.append(np.concatenate([boxes, scores[:, None]], axis=1))
        if not all_boxes:
            return np.empty((0, 5), np.float32)
        boxes = np.concatenate(all_boxes, axis=0)
        keep = nms_numpy(boxes[:, :4], boxes[:, 4], 0.7)
        return boxes[keep]

    def _refine(self, image: np.ndarray, boxes: np.ndarray, net_idx: int, size: int, thr: float):
        if len(boxes) == 0:
            return boxes, np.empty((0,), np.float32)
        sq = _square(boxes[:, :4])
        crops = np.stack([crop_resize(image, b, size) for b in sq])
        apply = self._rnet_apply if net_idx == 1 else self._onet_apply
        out = apply(self.params[net_idx], self._norm(crops))
        prob = np.asarray(out[0])[:, 1]
        reg = np.asarray(out[1])
        mask = prob > thr
        if not mask.any():
            return np.empty((0, 5), np.float32), np.empty((0,), np.float32)
        boxes = _apply_regression(sq[mask], reg[mask])
        scores = prob[mask]
        method = "min" if net_idx == 2 else "union"
        keep = nms_numpy(boxes, scores, 0.7, method)
        return (
            np.concatenate([boxes[keep], scores[keep, None]], axis=1),
            scores[keep],
        )

    def detect(self, image: np.ndarray) -> Tuple[Optional[np.ndarray], float]:
        """Best face box for one RGB uint8 image, or (None, 0.0)."""
        boxes = self._stage1(image)
        boxes, _ = self._refine(image, boxes, 1, 24, self.thresholds[1])
        boxes, _ = self._refine(image, boxes, 2, 48, self.thresholds[2])
        if len(boxes) == 0:
            return None, 0.0
        best = boxes[np.argmax(boxes[:, 4])]
        return best[:4], float(best[4])

    def crop_faces(self, frames: np.ndarray, prob_threshold: float = 0.3) -> np.ndarray:
        """(N, H, W, 3) uint8 -> (N, face_size, face_size, 3) uint8 aligned
        crops; frames without a confident face fall back to the previous
        crop (or a center crop for the first frame) — fixing the reference's
        None-append bug (`Dataload_vision.py:71-73`)."""
        from eav_tpu.ingest.video import center_crop_resize

        out = np.empty((len(frames), self.face_size, self.face_size, 3), np.uint8)
        prev = center_crop_resize(frames[:1], self.face_size)[0]
        for i, frame in enumerate(frames):
            box, prob = self.detect(frame)
            if box is not None and prob > prob_threshold:
                sq = _square(box[None])[0]
                crop = crop_resize(frame, sq, self.face_size)
                # facenet post_process + reference's re-expansion to uint8
                norm = (crop - 127.5) / 128.0
                crop = np.clip((norm + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)
                prev = crop
            out[i] = prev
        return out


def load_mtcnn_params(weights_dir: str):
    """Load P/R/O-Net params from .npz files (flattened path -> array),
    e.g. converted once from facenet_pytorch's data/*.pt."""
    import re

    def unflatten(flat):
        tree: dict = {}
        for k, v in flat.items():
            node = tree
            parts = k.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
        return tree

    out = []
    for net in ("pnet", "rnet", "onet"):
        path = os.path.join(weights_dir, f"{net}.npz")
        flat = dict(np.load(path))
        out.append(unflatten(flat))
    return tuple(out)


def default_face_cropper(cfg: VisionPreprocConfig) -> Optional[Callable]:
    """Detector-backed cropper when weights exist, else None (fallback)."""
    weights_dir = os.environ.get("EAV_TPU_MTCNN_WEIGHTS", "")
    if not weights_dir or not os.path.isdir(weights_dir):
        return None
    try:
        pp, rp, op = load_mtcnn_params(weights_dir)
    except Exception:
        return None
    det = MTCNNDetector(
        pp, rp, op,
        min_face_size=cfg.mtcnn_min_face_size,
        thresholds=cfg.mtcnn_thresholds,
        factor=cfg.mtcnn_factor,
        face_size=cfg.face_image_size,
    )
    return lambda frames: det.crop_faces(frames, cfg.face_prob_threshold)
