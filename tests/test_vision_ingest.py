"""Vision ingest: mp4 decode semantics, ViT processor parity, MTCNN nets."""

import dataclasses

import jax
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from eav_tpu.core.config import VisionPreprocConfig
from eav_tpu.ingest.video import DataLoadVision, center_crop_resize, decode_strided_frames
from eav_tpu.ingest.vision import flatten_trials_to_frames, preprocess_frames
from eav_tpu.models.mtcnn import MTCNNDetector, ONet, PNet, RNet, nms_numpy

EMOTIONS = ["Neutral", "Sadness", "Anger", "Happiness", "Calmness"]


def _write_mp4(path, n_frames=60, h=48, w=64, value_step=4):
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h)
    )
    assert writer.isOpened()
    for i in range(n_frames):
        frame = np.full((h, w, 3), min(255, i * value_step), np.uint8)
        writer.write(frame)
    writer.release()


def test_decode_strided(tmp_path):
    p = tmp_path / "v.mp4"
    _write_mp4(p, n_frames=60)
    frames = decode_strided_frames(str(p), stride=6, max_frames=60)
    assert len(frames) == 10
    assert frames[0].shape == (48, 64, 3)
    # frame i*6 has value ~ i*6*4 (lossy codec: generous tolerance)
    vals = [int(f.mean()) for f in frames]
    assert vals == sorted(vals)
    assert abs(vals[5] - 5 * 6 * 4) < 12


def test_dataload_vision_end_to_end(tmp_path):
    root = tmp_path / "EAV"
    vdir = root / "subject01" / "Video"
    vdir.mkdir(parents=True)
    for i, emo in enumerate(EMOTIONS[:2]):
        _write_mp4(vdir / f"subject_01_Speaking_{i}_{emo}_.mp4", n_frames=60)
        # Listening clips must be ignored (`Dataload_vision.py:47`)
        _write_mp4(vdir / f"subject_01_Listening_{i}_{emo}_.mp4", n_frames=60)
    cfg = VisionPreprocConfig(
        frame_stride=6, max_frames=60, frames_per_sample=5, image_size=32,
        face_detection=False,
    )
    loader = DataLoadVision(subject=1, parent_directory=str(root), config=cfg)
    x, y = loader.process()
    assert x.shape == (4, 5, 32, 32, 3)  # 2 clips x (10 frames / 5)
    assert y.tolist() == [0, 0, 1, 1]
    frames, labels = flatten_trials_to_frames(x, y)
    assert frames.shape == (20, 32, 32, 3) and labels.tolist() == [0] * 10 + [1] * 10


def test_vit_processor_parity(rng):
    from transformers import ViTImageProcessor

    proc = ViTImageProcessor(
        do_resize=True, size={"height": 224, "width": 224},
        do_rescale=True, do_normalize=True,
        image_mean=[0.5, 0.5, 0.5], image_std=[0.5, 0.5, 0.5],
    )
    img = rng.integers(0, 255, size=(56, 56, 3), dtype=np.uint8)
    ref = proc(images=img, return_tensors="np")["pixel_values"][0]  # (3,224,224)
    ours = preprocess_frames(img[None], size=224)[0]  # (224,224,3)
    assert np.abs(np.transpose(ours, (2, 0, 1)) - ref).max() < 0.04
    # identity path (already 224)
    img224 = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
    ref = proc(images=img224, return_tensors="np")["pixel_values"][0]
    ours = preprocess_frames(img224[None], size=224)[0]
    np.testing.assert_allclose(np.transpose(ours, (2, 0, 1)), ref, atol=1e-6)


def test_center_crop_resize(rng):
    frames = rng.integers(0, 255, size=(3, 48, 64, 3), dtype=np.uint8)
    out = center_crop_resize(frames, 56)
    assert out.shape == (3, 56, 56, 3)


def test_mtcnn_net_shapes(rng):
    key = jax.random.PRNGKey(0)
    pnet, rnet, onet = PNet(), RNet(), ONet()
    pp = pnet.init(key, np.zeros((1, 12, 12, 3), np.float32))["params"]
    prob, reg = pnet.apply({"params": pp}, np.zeros((2, 36, 24, 3), np.float32))
    assert prob.shape == (2, 13, 7, 2) and reg.shape == (2, 13, 7, 4)
    rp = rnet.init(key, np.zeros((1, 24, 24, 3), np.float32))["params"]
    prob, reg = rnet.apply({"params": rp}, np.zeros((3, 24, 24, 3), np.float32))
    assert prob.shape == (3, 2) and reg.shape == (3, 4)
    # dense4 input is 64*3*3 = 576 like facenet_pytorch
    assert rp["dense4"]["kernel"].shape == (576, 128)
    op = onet.init(key, np.zeros((1, 48, 48, 3), np.float32))["params"]
    prob, reg, lmk = onet.apply({"params": op}, np.zeros((3, 48, 48, 3), np.float32))
    assert prob.shape == (3, 2) and reg.shape == (3, 4) and lmk.shape == (3, 10)
    assert op["dense5"]["kernel"].shape == (1152, 256)


def test_nms():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms_numpy(boxes, scores, 0.3)
    assert keep.tolist() == [0, 2]


def test_mtcnn_cropper_fallback_shapes(rng):
    """With random weights detection is garbage, but the cropper contract
    (always produce a crop; never the reference's None-append bug) holds."""
    key = jax.random.PRNGKey(0)
    pp = PNet().init(key, np.zeros((1, 12, 12, 3), np.float32))["params"]
    rp = RNet().init(key, np.zeros((1, 24, 24, 3), np.float32))["params"]
    op = ONet().init(key, np.zeros((1, 48, 48, 3), np.float32))["params"]
    det = MTCNNDetector(pp, rp, op, face_size=56)
    frames = rng.integers(0, 255, size=(2, 64, 80, 3), dtype=np.uint8)
    crops = det.crop_faces(frames)
    assert crops.shape == (2, 56, 56, 3)
    assert crops.dtype == np.uint8


def test_vit_uint8_preprocessing_matches_host_path(rng):
    """ViT(preprocess_uint8=True) on raw uint8 == ViT on host-preprocessed."""
    import jax.numpy as jnp

    from eav_tpu.models.vit import ViT

    frames = rng.integers(0, 255, size=(2, 56, 56, 3), dtype=np.uint8)
    m_host = ViT(num_labels=5, hidden=32, layers=1, heads=2, mlp_dim=64, image_size=64)
    m_dev = ViT(
        num_labels=5, hidden=32, layers=1, heads=2, mlp_dim=64, image_size=64,
        preprocess_uint8=True,
    )
    v = m_dev.init(jax.random.PRNGKey(0), jnp.asarray(frames), train=False)
    host_in = preprocess_frames(frames, size=64)
    out_host = np.asarray(m_host.apply(v, jnp.asarray(host_in), train=False))
    out_dev = np.asarray(m_dev.apply(v, jnp.asarray(frames), train=False))
    np.testing.assert_allclose(out_dev, out_host, rtol=2e-4, atol=2e-4)


def test_threaded_decode_matches_serial(tmp_path):
    """decode_clips_threaded yields identical frames in input order (the
    prefetch pipeline must not reorder or corrupt clips)."""
    import cv2

    from eav_tpu.ingest.video import decode_clips_threaded, decode_strided_frames

    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"c{i}.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (32, 32))
        for f in range(24):
            w.write(rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8))
        w.release()
        paths.append(p)

    serial = {p: decode_strided_frames(p, stride=6, max_frames=24) for p in paths}
    out = list(decode_clips_threaded(paths, stride=6, max_frames=24, workers=3, prefetch=2))
    assert [p for p, _ in out] == paths  # input order preserved
    for p, frames in out:
        assert len(frames) == len(serial[p]) == 4
        for a, b in zip(frames, serial[p]):
            np.testing.assert_array_equal(a, b)
