"""MTCNN numeric oracle: the Flax cascade + weight converter vs an
independent torch/numpy reference (VERDICT round-1 missing #3/#5).

The oracle has two halves:
- torch modules expressing facenet_pytorch's P/R/O-Net architectures (conv ->
  PReLU -> ceil-mode max pool -> dense over a permute(0,3,2,1) flatten),
  loaded straight from a synthetic facenet-style state dict;
- a pure-numpy cascade driver (pyramid scales, stage-1 box generation with
  the x1=floor((2x+1)/s) offsets, per-stage NMS order, box regression,
  squaring) written independently of eav_tpu.models.mtcnn.

``convert_facenet_state_dict`` maps the same state dict into the Flax nets;
``MTCNNDetector.detect`` must then reproduce the oracle's final box and
probability exactly. Any drift in the box math or the converter layout
(conv/dense transposes, the (W,H,C)->(C,H,W) flatten permutation) fails this
test. Image resizing goes through jax.image.resize on both sides (shared
substrate; the cascade math around it is what's under test).

Reference usage: `Dataload_vision.py:25-29,63-74` (facenet_pytorch MTCNN,
image_size=56, thresholds/factor/min_face_size defaults).
"""

import os
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from eav_tpu.models.mtcnn import (
    MTCNNDetector,
    convert_facenet_state_dict,
)

# ---------------------------------------------------------------------------
# torch oracle nets (facenet_pytorch architecture, independent expression)
# ---------------------------------------------------------------------------


class TorchPNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 10, 3)
        self.prelu1 = tnn.PReLU(10)
        self.pool1 = tnn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(10, 16, 3)
        self.prelu2 = tnn.PReLU(16)
        self.conv3 = tnn.Conv2d(16, 32, 3)
        self.prelu3 = tnn.PReLU(32)
        self.conv4_1 = tnn.Conv2d(32, 2, 1)
        self.conv4_2 = tnn.Conv2d(32, 4, 1)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.prelu2(self.conv2(x))
        x = self.prelu3(self.conv3(x))
        return tF.softmax(self.conv4_1(x), dim=1), self.conv4_2(x)


class TorchRNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 28, 3)
        self.prelu1 = tnn.PReLU(28)
        self.pool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(28, 48, 3)
        self.prelu2 = tnn.PReLU(48)
        self.pool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = tnn.Conv2d(48, 64, 2)
        self.prelu3 = tnn.PReLU(64)
        self.dense4 = tnn.Linear(576, 128)
        self.prelu4 = tnn.PReLU(128)
        self.dense5_1 = tnn.Linear(128, 2)
        self.dense5_2 = tnn.Linear(128, 4)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.prelu3(self.conv3(x))
        x = x.permute(0, 3, 2, 1).contiguous().view(x.shape[0], -1)
        x = self.prelu4(self.dense4(x))
        return tF.softmax(self.dense5_1(x), dim=1), self.dense5_2(x)


class TorchONet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 32, 3)
        self.prelu1 = tnn.PReLU(32)
        self.pool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(32, 64, 3)
        self.prelu2 = tnn.PReLU(64)
        self.pool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = tnn.Conv2d(64, 64, 3)
        self.prelu3 = tnn.PReLU(64)
        self.pool3 = tnn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv4 = tnn.Conv2d(64, 128, 2)
        self.prelu4 = tnn.PReLU(128)
        self.dense5 = tnn.Linear(1152, 256)
        self.prelu5 = tnn.PReLU(256)
        self.dense6_1 = tnn.Linear(256, 2)
        self.dense6_2 = tnn.Linear(256, 4)
        self.dense6_3 = tnn.Linear(256, 10)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.pool3(self.prelu3(self.conv3(x)))
        x = self.prelu4(self.conv4(x))
        x = x.permute(0, 3, 2, 1).contiguous().view(x.shape[0], -1)
        x = self.prelu5(self.dense5(x))
        return tF.softmax(self.dense6_1(x), dim=1), self.dense6_2(x), self.dense6_3(x)


def _rand_state_dict(module: tnn.Module, seed: int) -> dict:
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for k, v in module.state_dict().items():
        if v.ndim >= 2:  # conv/dense: fan-in-scaled so activations stay O(1)
            fan_in = int(np.prod(v.shape[1:]))
            scale = 1.0 / np.sqrt(fan_in)
        else:
            scale = 0.25
        sd[k] = torch.randn(v.shape, generator=g) * scale
    return sd


# ---------------------------------------------------------------------------
# numpy cascade driver (independent of eav_tpu.models.mtcnn)
# ---------------------------------------------------------------------------


def _oracle_nms(boxes, scores, thr, method="union"):
    idx = list(np.argsort(-scores))
    keep = []
    while idx:
        i = idx.pop(0)
        keep.append(i)
        survivors = []
        for j in idx:
            ix1 = max(boxes[i, 0], boxes[j, 0])
            iy1 = max(boxes[i, 1], boxes[j, 1])
            ix2 = min(boxes[i, 2], boxes[j, 2])
            iy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, ix2 - ix1 + 1) * max(0.0, iy2 - iy1 + 1)
            ai = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
            aj = (boxes[j, 2] - boxes[j, 0] + 1) * (boxes[j, 3] - boxes[j, 1] + 1)
            o = inter / min(ai, aj) if method == "min" else inter / (ai + aj - inter)
            if o <= thr:
                survivors.append(j)
        idx = survivors
    return keep


def _oracle_regress(boxes, reg):
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    out = boxes.copy()
    out[:, 0] += reg[:, 0] * w
    out[:, 1] += reg[:, 1] * h
    out[:, 2] += reg[:, 2] * w
    out[:, 3] += reg[:, 3] * h
    return out


def _oracle_square(boxes):
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    s = np.maximum(w, h)
    out = boxes.copy()
    out[:, 0] = boxes[:, 0] + 0.5 * w - 0.5 * s
    out[:, 1] = boxes[:, 1] + 0.5 * h - 0.5 * s
    out[:, 2] = out[:, 0] + s
    out[:, 3] = out[:, 1] + s
    return out


def _oracle_crop(image, box, size):
    h, w = image.shape[:2]
    x1, y1, x2, y2 = [int(round(float(v))) for v in box]
    x1, y1 = max(0, x1), max(0, y1)
    x2 = min(w, max(x2, x1 + 1))
    y2 = min(h, max(y2, y1 + 1))
    crop = image[y1:y2, x1:x2].astype(np.float32)
    return np.asarray(
        jax.image.resize(jnp.asarray(crop), (size, size, 3), "bilinear", antialias=True)
    )


def _oracle_detect(image, pnet, rnet, onet, thresholds, min_face=20, factor=0.709):
    norm = lambda a: (a.astype(np.float32) - 127.5) / 128.0
    h, w = image.shape[:2]
    m = 12.0 / min_face
    minl = min(h, w) * m
    scales = []
    s = m
    while minl >= 12:
        scales.append(s)
        s *= factor
        minl *= factor

    rows_all = []
    for scale in scales:
        hs, ws = int(np.ceil(h * scale)), int(np.ceil(w * scale))
        if hs < 12 or ws < 12:
            continue
        img_s = np.asarray(
            jax.image.resize(jnp.asarray(image, jnp.float32), (hs, ws, 3), "bilinear")
        )
        with torch.no_grad():
            prob, reg = pnet(torch.from_numpy(norm(img_s)[None].transpose(0, 3, 1, 2)))
        prob = prob.numpy()[0, 1]
        reg = reg.numpy()[0].transpose(1, 2, 0)
        ys, xs = np.where(prob >= thresholds[0])
        if len(ys) == 0:
            continue
        b = np.stack(
            [
                np.floor((2.0 * xs + 1) / scale),
                np.floor((2.0 * ys + 1) / scale),
                np.floor((2.0 * xs + 12) / scale),
                np.floor((2.0 * ys + 12) / scale),
            ],
            axis=1,
        ).astype(np.float32)
        sc = prob[ys, xs]
        rg = reg[ys, xs]
        keep = _oracle_nms(b, sc, 0.5)
        rows_all.append(
            np.concatenate([b[keep], sc[keep, None], rg[keep]], axis=1)
        )
    if not rows_all:
        return None, 0.0
    rows = np.concatenate(rows_all)
    keep = _oracle_nms(rows[:, :4], rows[:, 4], 0.7)
    rows = rows[keep]
    boxes = _oracle_regress(rows[:, :4], rows[:, 5:9])
    scores = rows[:, 4]

    # stage 2: square -> crop 24 -> threshold -> NMS (pre-regression) -> regress
    sq = _oracle_square(boxes)
    crops = np.stack([_oracle_crop(image, b, 24) for b in sq])
    with torch.no_grad():
        prob, reg = rnet(torch.from_numpy(norm(crops).transpose(0, 3, 1, 2)))
    prob = prob.numpy()[:, 1]
    reg = reg.numpy()
    mask = prob > thresholds[1]
    if not mask.any():
        return None, 0.0
    sq, prob, reg = sq[mask], prob[mask], reg[mask]
    keep = _oracle_nms(sq, prob, 0.7)
    boxes = _oracle_regress(sq[keep], reg[keep])
    scores = prob[keep]

    # stage 3: square -> crop 48 -> threshold -> regress -> NMS(min)
    sq = _oracle_square(boxes)
    crops = np.stack([_oracle_crop(image, b, 48) for b in sq])
    with torch.no_grad():
        prob, reg, _ = onet(torch.from_numpy(norm(crops).transpose(0, 3, 1, 2)))
    prob = prob.numpy()[:, 1]
    reg = reg.numpy()
    mask = prob > thresholds[2]
    if not mask.any():
        return None, 0.0
    boxes = _oracle_regress(sq[mask], reg[mask])
    prob = prob[mask]
    keep = _oracle_nms(boxes, prob, 0.7, "min")
    boxes, prob = boxes[keep], prob[keep]
    best = int(np.argmax(prob))
    return boxes[best], float(prob[best])


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _build_everything():
    pnet_t, rnet_t, onet_t = TorchPNet(), TorchRNet(), TorchONet()
    sds = {
        "pnet": _rand_state_dict(pnet_t, 1),
        "rnet": _rand_state_dict(rnet_t, 2),
        "onet": _rand_state_dict(onet_t, 3),
    }
    pnet_t.load_state_dict(sds["pnet"])
    rnet_t.load_state_dict(sds["rnet"])
    onet_t.load_state_dict(sds["onet"])
    pnet_t.eval(), rnet_t.eval(), onet_t.eval()
    flax_params = tuple(
        convert_facenet_state_dict(n, sds[n]) for n in ("pnet", "rnet", "onet")
    )
    return (pnet_t, rnet_t, onet_t), flax_params


def test_flax_nets_match_torch_after_conversion():
    """Stage nets produce identical probs/regs after the layout conversion
    (covers the conv/dense transposes and the flatten permutation)."""
    (pnet_t, rnet_t, onet_t), (pp, rp, op) = _build_everything()
    rng = np.random.default_rng(0)

    from eav_tpu.models.mtcnn import ONet, PNet, RNet

    x = rng.normal(size=(2, 30, 26, 3)).astype(np.float32)
    ours = PNet().apply({"params": pp}, jnp.asarray(x))
    with torch.no_grad():
        theirs = pnet_t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(ours[0]), theirs[0].numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours[1]), theirs[1].numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )

    x = rng.normal(size=(3, 24, 24, 3)).astype(np.float32)
    ours = RNet().apply({"params": rp}, jnp.asarray(x))
    with torch.no_grad():
        theirs = rnet_t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours[0]), theirs[0].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours[1]), theirs[1].numpy(), rtol=1e-4, atol=1e-5)

    x = rng.normal(size=(3, 48, 48, 3)).astype(np.float32)
    ours = ONet().apply({"params": op}, jnp.asarray(x))
    with torch.no_grad():
        theirs = onet_t(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-4, atol=1e-5)


def test_cascade_matches_numpy_oracle():
    """Full detect(): pyramid, box generation, per-stage NMS order, box
    regression, squaring — the Flax cascade must reproduce the independent
    oracle's final box and probability on fixed random weights."""
    (pnet_t, rnet_t, onet_t), flax_params = _build_everything()
    rng = np.random.default_rng(7)
    image = rng.integers(0, 256, size=(60, 52, 3)).astype(np.uint8)

    # random nets: use permissive thresholds so the cascade produces boxes
    thresholds = (0.2, 0.05, 0.05)
    det = MTCNNDetector(*flax_params, thresholds=thresholds)
    box, prob = det.detect(image)
    obox, oprob = _oracle_detect(image, pnet_t, rnet_t, onet_t, thresholds)

    assert (box is None) == (obox is None), (box, obox)
    if box is not None:
        np.testing.assert_allclose(box, obox, rtol=1e-3, atol=0.05)
        assert abs(prob - oprob) < 1e-4


def test_converter_script_roundtrip(tmp_path):
    """scripts/convert_mtcnn.py: .pt dir -> .npz dir -> load_mtcnn_params
    gives the same trees as direct conversion (and the .pt fallback too)."""
    import sys

    sys.path.insert(0, "scripts")
    import convert_mtcnn

    from eav_tpu.models.mtcnn import load_mtcnn_params

    nets = {"pnet": TorchPNet(), "rnet": TorchRNet(), "onet": TorchONet()}
    src = tmp_path / "pt"
    out = tmp_path / "npz"
    src.mkdir()
    sds = {}
    for name, mod in nets.items():
        sds[name] = _rand_state_dict(mod, hash(name) % 1000)
        torch.save(sds[name], src / f"{name}.pt")
    assert convert_mtcnn.main(["--src", str(src), "--out", str(out)]) == 0

    from_npz = load_mtcnn_params(str(out))
    from_pt = load_mtcnn_params(str(src))
    direct = tuple(convert_facenet_state_dict(n, sds[n]) for n in ("pnet", "rnet", "onet"))
    for a, b, c in zip(from_npz, from_pt, direct):
        fa, fb, fc = (sorted(_flat(t).items()) for t in (a, b, c))
        for (ka, va), (kb, vb), (kc, vc) in zip(fa, fb, fc):
            assert ka == kb == kc
            np.testing.assert_array_equal(va, vc)
            np.testing.assert_array_equal(vb, vc)


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = np.asarray(v)
    return out


def test_resize_weight_matrix_matches_jax_resize():
    """resize_weight_matrix must be the EXACT linear map of
    jax.image.resize(..., 'bilinear', antialias=True) along one axis — the
    batched cascade's crops ride on this equality."""
    from eav_tpu.models.mtcnn import resize_weight_matrix

    rng = np.random.default_rng(0)
    for in_size, out_size in ((7, 24), (50, 24), (24, 24), (3, 48), (113, 56)):
        x = rng.normal(size=(in_size, 5)).astype(np.float32)
        ref = np.asarray(
            jax.image.resize(jnp.asarray(x), (out_size, 5), "bilinear", antialias=True)
        )
        got = resize_weight_matrix(in_size, out_size) @ x
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_batched_cascade_matches_sequential():
    """detect_batched / crop_faces_batched == the per-frame path (same boxes,
    probs, and uint8 crops) on a batch with faces, no-detection frames, and
    the prev-crop fallback chain."""
    _, flax_params = _build_everything()
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(6, 60, 52, 3)).astype(np.uint8)

    det = MTCNNDetector(*flax_params, thresholds=(0.2, 0.05, 0.05))
    seq = [det.detect(f) for f in frames]
    bat = det.detect_batched(frames)
    assert len(seq) == len(bat)
    n_hits = 0
    for (sb, sp), (bb, bp) in zip(seq, bat):
        assert (sb is None) == (bb is None)
        if sb is not None:
            n_hits += 1
            np.testing.assert_allclose(bb, sb, rtol=1e-4, atol=0.02)
            assert abs(bp - sp) < 1e-4
    assert n_hits > 0, "degenerate test: no frame produced a detection"

    crops_seq = det.crop_faces(frames, prob_threshold=0.0)
    crops_bat = det.crop_faces_batched(frames, prob_threshold=0.0)
    # uint8 crops may differ by 1 LSB where float rounding crosses a .5
    assert np.abs(crops_seq.astype(int) - crops_bat.astype(int)).max() <= 1


def test_batched_cascade_chunked_matches_unchunked():
    """crop_chunk bounds the per-call HBM gather (real clips produce
    thousands of stage-1 candidates); a tiny chunk must reproduce the
    single-chunk results exactly — same boxes, probs, crops."""
    _, flax_params = _build_everything()
    rng = np.random.default_rng(12)
    frames = rng.integers(0, 256, size=(6, 60, 52, 3)).astype(np.uint8)

    det = MTCNNDetector(*flax_params, thresholds=(0.2, 0.05, 0.05))
    ref_det = det.detect_batched(frames)
    ref_crops = det.crop_faces_batched(frames, prob_threshold=0.0)

    det.crop_chunk = 2  # force many chunks through every cascade stage
    got_det = det.detect_batched(frames)
    got_crops = det.crop_faces_batched(frames, prob_threshold=0.0)

    for (rb, rp), (gb, gp) in zip(ref_det, got_det):
        assert (rb is None) == (gb is None)
        if rb is not None:
            np.testing.assert_allclose(gb, rb, rtol=1e-5, atol=1e-4)
            assert abs(gp - rp) < 1e-5
    np.testing.assert_array_equal(ref_crops, got_crops)


def test_convert_cli_verify_mode(tmp_path):
    """`convert_mtcnn.py --verify` (VERDICT r4 next #8): the one-command
    readiness path runs end-to-end — convert .pt -> npz, load, batched
    cascade over the synthetic-face fixture — and exits NONZERO on these
    architecture-parity random weights (only genuine facenet weights can
    earn exit 0), keeping the real-weights flag visibly un-earned."""
    import subprocess
    import sys

    for name, mod in (("pnet", TorchPNet()), ("rnet", TorchRNet()),
                      ("onet", TorchONet())):
        mod.load_state_dict(_rand_state_dict(mod, hash(name) % 1000))
        torch.save(mod.state_dict(), tmp_path / f"{name}.pt")
    out = tmp_path / "npz"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "convert_mtcnn.py"),
         "--src", str(tmp_path), "--out", str(out), "--verify"],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env,
    )
    # conversion itself succeeded...
    for name in ("pnet", "rnet", "onet"):
        assert (out / f"{name}.npz").exists(), r.stdout + r.stderr
    # ...but random weights cannot certify readiness
    assert r.returncode == 1, (r.returncode, r.stdout, r.stderr)
    assert '"mtcnn_verify": "FAILED"' in r.stdout, r.stdout
    assert "not working facenet_pytorch weights" in r.stderr


def test_synthetic_face_fixture_shape():
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "convert_mtcnn", os.path.join(repo, "scripts", "convert_mtcnn.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    img = m.synthetic_face_image()
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    # deterministic (no rng): two draws are identical
    np.testing.assert_array_equal(img, m.synthetic_face_image())
    # face pixels are brighter than the background
    assert img[120, 160].mean() > img[5, 5].mean() + 50
