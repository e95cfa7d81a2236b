"""Audio ingest: .wav -> 5 s segments + labels, plus batched device frontends.

Behavioral equivalent of the reference ``DataLoadAudio``
(`Dataload_audio.py:10-78`): per subject, list the Audio dir, parse the
emotion from filename token 4, decode, resample to the target rate, chop into
5 s segments (4 per 20 s file -> 400 segments), map labels
{Neutral:0, Sadness:1, Anger:2, Happiness:3, Calmness:4}.

TPU-first differences: decode is a dependency-free RIFF parse (ingest/wav.py,
C++ fast path optional), resampling is one batched XLA polyphase conv over
all of a subject's files (ops/signal.resample_poly) instead of per-file
torchaudio calls, and the AST fbank / SCNN-180 frontends (ops/spectral.py)
run as a single fused device program per subject.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from eav_tpu.core.config import EMOTION_TO_INDEX, AudioPreprocConfig
from eav_tpu.ingest.wav import read_wav
from eav_tpu.ops.signal import resample_poly
from eav_tpu.ops.spectral import ast_features, scnn180_features


def emotion_from_filename(name: str) -> str:
    """Token 4 of the underscore-split basename (`Dataload_audio.py:31`)."""
    return os.path.basename(name).split("_")[4].split(".")[0]


def segment_waveform(wave: np.ndarray, segment_samples: int) -> np.ndarray:
    """(T,) -> (n_segments, segment_samples), floor division
    (`Dataload_audio.py:49-55`)."""
    n = len(wave) // segment_samples
    return wave[: n * segment_samples].reshape(n, segment_samples)


class DataLoadAudio:
    """Public interface parity: ``process() -> (feature, label_indexes)``
    with feature = (n_segments, segment_samples) raw waveforms."""

    def __init__(
        self,
        subject: int = 1,
        parent_directory: str = "./Datasets/EAV",
        config: AudioPreprocConfig = AudioPreprocConfig(),
    ):
        self.subject = subject
        self.parent_directory = parent_directory
        self.cfg = config

    def data_files(self) -> Tuple[List[str], List[str]]:
        path = os.path.join(self.parent_directory, f"subject{self.subject:02d}", "Audio")
        files, emotions = [], []
        for name in sorted(os.listdir(path)):
            if not name.endswith(".wav"):
                continue
            files.append(os.path.join(path, name))
            emotions.append(emotion_from_filename(name))
        return files, emotions

    def process(self, target_sr: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        target_sr = target_sr or self.cfg.target_sr
        files, emotions = self.data_files()
        from eav_tpu.ingest import native

        # decode (native threaded queue when built), in dataset order
        if native.available() and files:
            pf = native.WavPrefetcher(n_threads=4)
            for f in files:
                pf.submit(f)
            decoded = {path: (wave, sr) for path, wave, sr in pf}
            pf.close()
            waves = [decoded[f][0][0] for f in files]
            srs = [decoded[f][1] for f in files]
        else:
            pairs = [read_wav(f) for f in files]
            waves = [w[0] for w, _ in pairs]
            srs = [sr for _, sr in pairs]

        # resample per sample-rate group in one batched device call, then
        # reassemble in ORIGINAL file order — `EAVDataSplit` depends on the
        # dataset's temporal order (ingest/split.py)
        import math

        resampled: dict = {}
        for sr in sorted(set(srs)):
            idxs = [i for i, r in enumerate(srs) if r == sr]
            group = [waves[i] for i in idxs]
            if sr != target_sr:
                g = math.gcd(target_sr, sr)
                if len({len(w) for w in group}) == 1:
                    res = np.asarray(resample_poly(np.stack(group), target_sr // g, sr // g))
                    group = list(res)
                else:
                    group = [
                        np.asarray(resample_poly(w, target_sr // g, sr // g))
                        for w in group
                    ]
            for i, w in zip(idxs, group):
                resampled[i] = w

        seg_len = int(round(self.cfg.segment_seconds * target_sr))
        segs, labels = [], []
        for i, e in enumerate(emotions):
            s = segment_waveform(np.asarray(resampled[i]), seg_len)
            segs.append(s)
            labels.extend([EMOTION_TO_INDEX[e]] * len(s))
        feature = np.concatenate(segs, axis=0).astype(np.float32)
        return feature, np.asarray(labels, np.int32)


def ast_frontend(segments: np.ndarray, cfg: AudioPreprocConfig = AudioPreprocConfig(), batch: int = 64) -> np.ndarray:
    """(N, 80000) raw 16 kHz -> (N, 1024, 128) normalized fbanks, batched on
    device (replaces `Transformer_Audio.py:38-42`)."""
    outs = []
    for i in range(0, len(segments), batch):
        outs.append(
            np.asarray(
                ast_features(
                    jnp.asarray(segments[i : i + batch], jnp.float32),
                    mean=cfg.norm_mean,
                    std=cfg.norm_std,
                    num_mel_bins=cfg.num_mel_bins,
                    max_frames=cfg.max_frames,
                    sampling_rate=cfg.target_sr,
                )
            )
        )
    return np.concatenate(outs, axis=0)


def scnn_frontend(segments_22k: np.ndarray, cfg: AudioPreprocConfig = AudioPreprocConfig(), batch: int = 64) -> np.ndarray:
    """(N, T@22.05k) -> (N, 180) notebook features (C14)."""
    outs = []
    for i in range(0, len(segments_22k), batch):
        outs.append(
            np.asarray(
                scnn180_features(jnp.asarray(segments_22k[i : i + batch], jnp.float32), sr=cfg.scnn_sr)
            )
        )
    return np.concatenate(outs, axis=0)
