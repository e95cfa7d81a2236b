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
    x1, y1, x2, y2 = _clamp_box(box, h, w)
    crop = image[y1:y2, x1:x2].astype(np.float32)
    out = jax.image.resize(jnp.asarray(crop), (size, size, 3), "bilinear", antialias=True)
    return np.asarray(out)


def _clamp_box(box, h: int, w: int) -> Tuple[int, int, int, int]:
    x1, y1, x2, y2 = [int(round(float(v))) for v in box]
    x1, y1 = max(0, x1), max(0, y1)
    return x1, y1, min(w, max(x2, x1 + 1)), min(h, max(y2, y1 + 1))


def resize_weight_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) linear map identical to
    ``jax.image.resize(x, (out_size, ...), 'bilinear', antialias=True)``
    along one axis: triangle kernel widened by 1/scale when downscaling,
    weights renormalized over the in-range taps (resize is linear, so the
    map is exact — tested against jax.image.resize in tests/test_mtcnn_oracle).
    Lets a batch of variable-size crops become ONE device einsum instead of a
    device round trip per crop."""
    scale = out_size / in_size
    kernel_scale = max(1.0, 1.0 / scale)
    sample_f = (np.arange(out_size) + 0.5) / scale - 0.5
    x = np.abs(sample_f[:, None] - np.arange(in_size)[None, :]) / kernel_scale
    w = np.maximum(0.0, 1.0 - x)
    w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w.astype(np.float32)


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

        # ---- batched-path device programs (one call per pyramid scale /
        # cascade stage for a WHOLE frame batch; the per-frame path above
        # costs ~60-80 device round trips per frame, which on a tunneled
        # device is ~2 s/frame) ----
        def _pnet_scaled(p, frames_u8, hs: int, ws: int):
            n = frames_u8.shape[0]
            imgs = jax.image.resize(
                frames_u8.astype(jnp.float32), (n, hs, ws, 3), "bilinear"
            )
            return self.pnet.apply({"params": p}, (imgs - 127.5) / 128.0)

        self._pnet_scaled = jax.jit(_pnet_scaled, static_argnums=(2, 3))

        def _gather_crops(frames_u8, idx, wy, wx):
            # wy (M, S, H), wx (M, S, W): exact resize-as-linear-map weights
            # (resize_weight_matrix) — variable crop geometry rides in the
            # weights, so one compiled program serves every box set.
            f = frames_u8[idx].astype(jnp.float32)  # (M, H, W, 3)
            t = jnp.einsum("msh,mhwc->mswc", wy, f)
            return jnp.einsum("mtw,mswc->mstc", wx, t)  # (M, S, S, 3)

        self._gather_crops = jax.jit(_gather_crops)
        self._rnet_crops = jax.jit(
            lambda p, frames_u8, idx, wy, wx: self.rnet.apply(
                {"params": p},
                (_gather_crops(frames_u8, idx, wy, wx) - 127.5) / 128.0,
            )
        )
        self._onet_crops = jax.jit(
            lambda p, frames_u8, idx, wy, wx: self.onet.apply(
                {"params": p},
                (_gather_crops(frames_u8, idx, wy, wx) - 127.5) / 128.0,
            )
        )

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
        """P-Net pyramid sweep, following facenet_pytorch detect_face's
        first-stage semantics (the library the reference wraps,
        `Dataload_vision.py:25-29`): per-scale NMS 0.5 on RAW boxes, then
        cross-scale NMS 0.7, then box regression. Box coords use the
        original MTCNN offsets x1=floor((2x+1)/s), x2=floor((2x+12)/s)."""
        h, w = image.shape[:2]
        all_rows = []
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
            ys, xs = np.where(prob >= self.thresholds[0])
            if len(ys) == 0:
                continue
            stride, cell = 2.0, 12.0
            x1 = np.floor((xs * stride + 1) / scale)
            y1 = np.floor((ys * stride + 1) / scale)
            x2 = np.floor((xs * stride + cell) / scale)
            y2 = np.floor((ys * stride + cell) / scale)
            boxes = np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)
            scores = prob[ys, xs]
            r = reg[ys, xs]
            keep = nms_numpy(boxes, scores, 0.5)
            rows = np.concatenate(
                [boxes[keep], scores[keep, None], r[keep]], axis=1
            )  # (n, 9): box, score, reg
            all_rows.append(rows)
        if not all_rows:
            return np.empty((0, 5), np.float32)
        rows = np.concatenate(all_rows, axis=0)
        keep = nms_numpy(rows[:, :4], rows[:, 4], 0.7)
        rows = rows[keep]
        boxes = _apply_regression(rows[:, :4], rows[:, 5:9])
        return np.concatenate([boxes, rows[:, 4:5]], axis=1)

    def _stage2(self, image: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        """R-Net refine: square crops -> threshold -> NMS on the PRE-regression
        boxes -> regression (facenet_pytorch's second-stage order)."""
        if len(boxes) == 0:
            return np.empty((0, 5), np.float32)
        sq = _square(boxes[:, :4])
        crops = np.stack([crop_resize(image, b, 24) for b in sq])
        prob, reg = self._rnet_apply(self.params[1], self._norm(crops))
        prob = np.asarray(prob)[:, 1]
        reg = np.asarray(reg)
        mask = prob > self.thresholds[1]
        if not mask.any():
            return np.empty((0, 5), np.float32)
        sq, prob, reg = sq[mask], prob[mask], reg[mask]
        keep = nms_numpy(sq, prob, 0.7)
        out = _apply_regression(sq[keep], reg[keep])
        return np.concatenate([out, prob[keep, None]], axis=1)

    def _stage3(self, image: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        """O-Net refine: square crops -> threshold -> regression -> NMS with
        the 'min' overlap (facenet_pytorch's third-stage order)."""
        if len(boxes) == 0:
            return np.empty((0, 5), np.float32)
        sq = _square(boxes[:, :4])
        crops = np.stack([crop_resize(image, b, 48) for b in sq])
        prob, reg, _landmarks = self._onet_apply(self.params[2], self._norm(crops))
        prob = np.asarray(prob)[:, 1]
        reg = np.asarray(reg)
        mask = prob > self.thresholds[2]
        if not mask.any():
            return np.empty((0, 5), np.float32)
        out = _apply_regression(sq[mask], reg[mask])
        prob = prob[mask]
        keep = nms_numpy(out, prob, 0.7, "min")
        return np.concatenate([out[keep], prob[keep, None]], axis=1)

    def detect(self, image: np.ndarray) -> Tuple[Optional[np.ndarray], float]:
        """Best face box for one RGB uint8 image, or (None, 0.0)."""
        boxes = self._stage1(image)
        boxes = self._stage2(image, boxes)
        boxes = self._stage3(image, boxes)
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
                # facenet's extract_face crops the detection box as-is (no
                # re-squaring; aspect distortion absorbed by the resize)
                crop = crop_resize(frame, box, self.face_size)
                # facenet post_process + reference's re-expansion to uint8
                norm = (crop - 127.5) / 128.0
                crop = np.clip((norm + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)
                prev = crop
            out[i] = prev
        return out

    # ------------------------------------------------------------------
    # Batched cascade: same math as detect()/crop_faces() (stage semantics,
    # thresholds, NMS order, crop numerics via resize_weight_matrix), but
    # one device call per pyramid scale / stage for the WHOLE frame batch.

    def _crop_weights(self, boxes: np.ndarray, h: int, w: int, size: int):
        m = len(boxes)
        wy = np.zeros((m, size, h), np.float32)
        wx = np.zeros((m, size, w), np.float32)
        for i, b in enumerate(boxes):
            x1, y1, x2, y2 = _clamp_box(b, h, w)
            wy[i, :, y1:y2] = resize_weight_matrix(y2 - y1, size)
            wx[i, :, x1:x2] = resize_weight_matrix(x2 - x1, size)
        return wy, wx

    # crop programs gather a float32 frame copy per candidate box
    # ((M, H, W, 3) inside _gather_crops) — at real clip scale (100 frames x
    # ~50 stage-1 survivors) an unchunked M would need tens of GB of HBM, so
    # every crop call runs in bounded chunks of this many boxes (256 boxes @
    # 480p ≈ 0.9 GB transient)
    crop_chunk = 256

    def _run_crops_chunked(self, call, idx: np.ndarray, wy: np.ndarray, wx: np.ndarray):
        """Run ``call(pidx, pwy, pwx) -> array-or-tuple`` (leading dim =
        len(pidx)) over ``idx`` in ``crop_chunk``-bounded chunks; returns the
        per-output concatenations sliced to len(idx). Chunks reuse compiled
        shapes via _pad_m's bucketing."""
        parts = None
        for i in range(0, len(idx), self.crop_chunk):
            sl = slice(i, i + self.crop_chunk)
            m = len(idx[sl])
            outs = call(*self._pad_m(idx[sl], wy[sl], wx[sl]))
            outs = outs if isinstance(outs, tuple) else (outs,)
            outs = [np.asarray(o)[:m] for o in outs]
            parts = (
                [[o] for o in outs]
                if parts is None
                else [p + [o] for p, o in zip(parts, outs)]
            )
        return [np.concatenate(p, axis=0) for p in parts]

    @staticmethod
    def _pad_m(idx: np.ndarray, wy: np.ndarray, wx: np.ndarray, mult: int = 32):
        """Pad the box axis to a bucket size so box-count changes reuse the
        compiled program (padded rows give all-zero crops, discarded)."""
        m = len(idx)
        b = max(mult, -(-m // mult) * mult)
        if b == m:
            return idx, wy, wx
        pad = b - m
        return (
            np.concatenate([idx, np.zeros(pad, idx.dtype)]),
            np.concatenate([wy, np.zeros((pad,) + wy.shape[1:], wy.dtype)]),
            np.concatenate([wx, np.zeros((pad,) + wx.shape[1:], wx.dtype)]),
        )

    def _stage1_host(self, prob: np.ndarray, reg: np.ndarray, scale: float):
        """Shared stage-1 map->rows math for one frame at one scale."""
        ys, xs = np.where(prob >= self.thresholds[0])
        if len(ys) == 0:
            return None
        stride, cell = 2.0, 12.0
        x1 = np.floor((xs * stride + 1) / scale)
        y1 = np.floor((ys * stride + 1) / scale)
        x2 = np.floor((xs * stride + cell) / scale)
        y2 = np.floor((ys * stride + cell) / scale)
        boxes = np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)
        scores = prob[ys, xs]
        r = reg[ys, xs]
        keep = nms_numpy(boxes, scores, 0.5)
        return np.concatenate([boxes[keep], scores[keep, None], r[keep]], axis=1)

    def detect_batched(self, frames: np.ndarray) -> List[Tuple[Optional[np.ndarray], float]]:
        """Best (box, prob) per frame for a uint8 (N, H, W, 3) batch — the
        cascade of detect() with O(scales + stages) device calls total
        instead of O(N * (scales + boxes))."""
        frames = np.ascontiguousarray(frames)
        n, h, w = frames.shape[:3]
        fdev = jnp.asarray(frames)
        rows_per_frame: List[list] = [[] for _ in range(n)]
        for scale in self._scales(h, w):
            hs, ws = int(np.ceil(h * scale)), int(np.ceil(w * scale))
            if hs < 12 or ws < 12:
                continue
            prob, reg = self._pnet_scaled(self.params[0], fdev, hs, ws)
            prob = np.asarray(prob)[..., 1]
            reg = np.asarray(reg)
            for fi in range(n):
                rows = self._stage1_host(prob[fi], reg[fi], scale)
                if rows is not None:
                    rows_per_frame[fi].append(rows)
        stage1 = []
        for fi in range(n):
            if not rows_per_frame[fi]:
                stage1.append(np.empty((0, 5), np.float32))
                continue
            rows = np.concatenate(rows_per_frame[fi], axis=0)
            keep = nms_numpy(rows[:, :4], rows[:, 4], 0.7)
            rows = rows[keep]
            boxes = _apply_regression(rows[:, :4], rows[:, 5:9])
            stage1.append(np.concatenate([boxes, rows[:, 4:5]], axis=1))

        def flatten(per_frame):
            idx = np.concatenate(
                [np.full(len(b), fi, np.int32) for fi, b in enumerate(per_frame)]
            ) if per_frame else np.empty(0, np.int32)
            sq = (
                np.concatenate([_square(b[:, :4]) for b in per_frame if len(b)])
                if idx.size else np.empty((0, 4), np.float32)
            )
            return idx, sq

        # stage 2 (R-Net) — one batched call over every frame's candidates
        idx, sq = flatten(stage1)
        stage2 = [np.empty((0, 5), np.float32)] * n
        if idx.size:
            wy, wx = self._crop_weights(sq, h, w, 24)
            prob, reg = self._run_crops_chunked(
                lambda a, b, c: self._rnet_crops(self.params[1], fdev, a, b, c),
                idx, wy, wx,
            )
            prob = prob[:, 1]
            for fi in range(n):
                m = (idx == fi) & (prob > self.thresholds[1])
                if not m.any():
                    continue
                sqf, pf, rf = sq[m], prob[m], reg[m]
                keep = nms_numpy(sqf, pf, 0.7)
                out = _apply_regression(sqf[keep], rf[keep])
                stage2[fi] = np.concatenate([out, pf[keep, None]], axis=1)

        # stage 3 (O-Net)
        idx, sq = flatten(stage2)
        stage3: List[Tuple[Optional[np.ndarray], float]] = [(None, 0.0)] * n
        if idx.size:
            wy, wx = self._crop_weights(sq, h, w, 48)
            prob, reg, _lm = self._run_crops_chunked(
                lambda a, b, c: self._onet_crops(self.params[2], fdev, a, b, c),
                idx, wy, wx,
            )
            prob = prob[:, 1]
            for fi in range(n):
                m = (idx == fi) & (prob > self.thresholds[2])
                if not m.any():
                    continue
                out = _apply_regression(sq[m], reg[m])
                pf = prob[m]
                keep = nms_numpy(out, pf, 0.7, "min")
                out, pf = out[keep], pf[keep]
                best = int(np.argmax(pf))
                stage3[fi] = (out[best], float(pf[best]))
        return stage3

    def crop_faces_batched(self, frames: np.ndarray, prob_threshold: float = 0.3) -> np.ndarray:
        """crop_faces() semantics (prev-crop fallback included) with the
        batched cascade + ONE batched device call for the final aligned
        crops."""
        from eav_tpu.ingest.video import center_crop_resize

        n, h, w = frames.shape[:3]
        dets = self.detect_batched(frames)
        hit = [i for i, (b, p) in enumerate(dets) if b is not None and p > prob_threshold]
        crops = {}
        if hit:
            boxes = np.stack([dets[i][0] for i in hit])
            wy, wx = self._crop_weights(boxes, h, w, self.face_size)
            fdev = jnp.asarray(frames)
            (raw,) = self._run_crops_chunked(
                lambda a, b, c: self._gather_crops(fdev, a, b, c),
                np.asarray(hit, np.int32), wy, wx,
            )
            norm = (raw - 127.5) / 128.0
            faces = np.clip((norm + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)
            crops = dict(zip(hit, faces))
        out = np.empty((n, self.face_size, self.face_size, 3), np.uint8)
        prev = center_crop_resize(frames[:1], self.face_size)[0]
        for i in range(n):
            prev = crops.get(i, prev)
            out[i] = prev
        return out


# facenet_pytorch flattens the last conv's NCHW activations after a
# permute(0, 3, 2, 1) -> (B, W, H, C); our Flax nets flatten (B, C, H, W).
# (net -> (first dense name, H, W, C) of that conv output)
_DENSE_SPATIAL = {"rnet": ("dense4", 3, 3, 64), "onet": ("dense5", 3, 3, 128)}


def _to_np(v) -> np.ndarray:
    try:
        return v.detach().cpu().numpy().astype(np.float32)
    except AttributeError:
        return np.asarray(v, np.float32)


def convert_facenet_state_dict(net: str, sd) -> dict:
    """facenet_pytorch P/R/O-Net state dict -> Flax param tree.

    Layout mapping: conv (O,I,kh,kw) -> (kh,kw,I,O); dense (out,in) -> (in,out)
    with the first dense's columns permuted from facenet's (W,H,C) flatten
    order to our (C,H,W); PReLU weight -> alpha."""
    out: dict = {}
    for k, v in sd.items():
        name, kind = k.rsplit(".", 1)
        v = _to_np(v)
        leaf = out.setdefault(name, {})
        if kind == "bias":
            leaf["bias"] = v
        elif v.ndim == 4:  # conv weight
            leaf["kernel"] = np.transpose(v, (2, 3, 1, 0))
        elif v.ndim == 2:  # dense weight
            first_dense, H, W, C = _DENSE_SPATIAL.get(net, (None, 0, 0, 0))
            if name == first_dense:
                v = (
                    v.reshape(v.shape[0], W, H, C)
                    .transpose(0, 3, 2, 1)
                    .reshape(v.shape[0], -1)
                )
            leaf["kernel"] = v.T
        elif v.ndim == 1:  # PReLU weight
            leaf["alpha"] = v
        else:
            raise ValueError(f"unexpected tensor {k} with shape {v.shape}")
    return out


def _flatten_tree(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            flat.update(_flatten_tree(v, f"{prefix}{k}/"))
        else:
            flat[f"{prefix}{k}"] = np.asarray(v)
    return flat


def _unflatten_tree(flat):
    tree: dict = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_mtcnn_params(weights_dir: str):
    """Load P/R/O-Net params from ``{p,r,o}net.npz`` (flattened path ->
    array; produced by scripts/convert_mtcnn.py), falling back to converting
    facenet_pytorch ``{p,r,o}net.pt`` state dicts in place."""
    out = []
    for net in ("pnet", "rnet", "onet"):
        npz = os.path.join(weights_dir, f"{net}.npz")
        pt = os.path.join(weights_dir, f"{net}.pt")
        if os.path.exists(npz):
            out.append(_unflatten_tree(dict(np.load(npz))))
        elif os.path.exists(pt):
            import torch

            sd = torch.load(pt, map_location="cpu", weights_only=True)
            out.append(convert_facenet_state_dict(net, sd))
        else:
            raise FileNotFoundError(f"missing {npz} (or {pt})")
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
    # batched cascade: numerically the per-frame path (parity-tested) at
    # O(scales + stages) device calls per clip instead of O(frames * boxes)
    return lambda frames: det.crop_faces_batched(frames, cfg.face_prob_threshold)
