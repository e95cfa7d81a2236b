"""Audio ingest: WAV parity, segmentation/label semantics, SCNN shapes, and a
synthetic-subject end-to-end SCNN run."""

import os
import wave as stdlib_wave

import jax
import numpy as np
import pytest

from eav_tpu.core.config import AudioPreprocConfig, FinetuneConfig, PhaseConfig
from eav_tpu.ingest.audio import (
    DataLoadAudio,
    emotion_from_filename,
    scnn_frontend,
    segment_waveform,
)
from eav_tpu.ingest.split import eav_split
from eav_tpu.ingest.wav import read_wav, write_wav
from eav_tpu.models.scnn_audio import SCNNAudio
from eav_tpu.train.loop import JitTrainer

EMOTIONS = ["Neutral", "Sadness", "Anger", "Happiness", "Calmness"]


def test_wav_roundtrip_and_stdlib_compat(tmp_path, rng):
    sr = 16000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, sr)
    y, sr2 = read_wav(p)
    assert sr2 == sr and y.shape == (1, sr)
    np.testing.assert_allclose(y[0], x, atol=1.0 / 32767)
    with stdlib_wave.open(p) as w:
        assert w.getframerate() == sr and w.getnchannels() == 1
        raw = np.frombuffer(w.readframes(sr), dtype="<i2")
    np.testing.assert_allclose(y[0], raw / 32768.0, atol=1e-7)


def test_wav_stereo(tmp_path, rng):
    x = rng.normal(size=(2, 1000)).astype(np.float32) * 0.1
    p = str(tmp_path / "s.wav")
    write_wav(p, x, 8000)
    y, sr = read_wav(p)
    assert y.shape == (2, 1000) and sr == 8000
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_emotion_parse():
    # reference filename layout: subject_NN_task_iter_Emotion[...].wav
    assert emotion_from_filename("subject_01_Speaking_3_Anger_012.wav") == "Anger"
    assert emotion_from_filename("/a/b/subject_30_Speaking_1_Calmness.wav") == "Calmness"


def test_segmentation():
    x = np.arange(20 * 16000, dtype=np.float32)
    s = segment_waveform(x, 5 * 16000)
    assert s.shape == (4, 80000)
    np.testing.assert_array_equal(s[1][:3], [80000, 80001, 80002])


@pytest.fixture
def synthetic_audio_subject(tmp_path, rng):
    """20 files x 4 segments = 80 segments, 4 files/emotion, at 32 kHz to
    exercise resampling (32k -> 16k)."""
    root = tmp_path / "EAV"
    adir = root / "subject01" / "Audio"
    adir.mkdir(parents=True)
    sr = 32000
    t = np.arange(20 * sr) / sr
    for i, emo in enumerate(EMOTIONS):
        for k in range(4):
            # emotion-specific tone so labels are learnable
            f0 = 150 + 80 * i + 5 * k
            x = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.normal(size=t.shape)
            write_wav(str(adir / f"subject_01_Speaking_{k}_{emo}_{i}{k}.wav"), x, sr)
    return str(root)


def test_dataload_audio_end_to_end(synthetic_audio_subject):
    loader = DataLoadAudio(subject=1, parent_directory=synthetic_audio_subject)
    feat, labels = loader.process()
    assert feat.shape == (80, 80000)
    assert labels.shape == (80,)
    assert sorted(set(labels.tolist())) == [0, 1, 2, 3, 4]
    assert [int((labels == c).sum()) for c in range(5)] == [16] * 5


def test_scnn_shapes():
    model = SCNNAudio()
    v = model.init(jax.random.PRNGKey(0), np.zeros((2, 180), np.float32), train=False)
    flat_head = v["params"]["head"]["kernel"]
    assert flat_head.shape == (2816, 5)  # 128 * 22, `CNN_audio.py:32`
    out = model.apply(v, np.zeros((2, 180), np.float32), train=False)
    assert out.shape == (2, 5)


@pytest.fixture
def synthetic_audio_subject_22k(tmp_path, rng):
    """Files already at 22.05 kHz (no resample) for the SCNN path."""
    root = tmp_path / "EAV22"
    adir = root / "subject01" / "Audio"
    adir.mkdir(parents=True)
    sr = 22050
    t = np.arange(20 * sr) / sr
    for i, emo in enumerate(EMOTIONS):
        for k in range(4):
            f0 = 150 + 80 * i + 5 * k
            x = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.normal(size=t.shape)
            write_wav(str(adir / f"subject_01_Speaking_{k}_{emo}_{i}{k}.wav"), x, sr)
    return str(root)


@pytest.mark.slow
def test_scnn_learns_synthetic_features(synthetic_audio_subject_22k):
    loader = DataLoadAudio(subject=1, parent_directory=synthetic_audio_subject_22k)
    segs, labels = loader.process(target_sr=22050)
    feats = scnn_frontend(segs)
    assert feats.shape == (80, 180)
    tr_x, tr_y, te_x, te_y = eav_split(feats, labels, h_idx=12)
    cfg = FinetuneConfig(
        model="scnn_audio",
        batch_size=16,
        optimizer="adam",
        weight_decay=0.0,
        phases=(PhaseConfig(epochs=12, lr=2e-3, freeze=False),),
    )
    # standardize features like any sane pipeline; tones are trivially separable
    mu, sd = tr_x.mean(0), tr_x.std(0) + 1e-6
    res = JitTrainer(SCNNAudio(), cfg).fit(
        ((tr_x - mu) / sd, tr_y, (te_x - mu) / sd, te_y), seed=0
    )
    assert res.history["test_acc"][-1] > 0.5, res.history["test_acc"][-5:]
