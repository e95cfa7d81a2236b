"""EEG ingest: .mat -> (400, 30, 500) float trials + (400,) int labels.

Behavioral equivalent of the reference ``DataLoadEEG``
(`Dataload_eeg.py:35-160`), re-designed as one fused, jit-compiled XLA
pipeline instead of per-channel scipy loops:

  load .mat (10000, 30, 200) --transpose--> (30, 10000, 200)
    -> flatten trials per channel (MATLAB F-order semantics)
    -> polyphase resample 500 -> 100 Hz         (one strided conv)
    -> order-5 Butterworth [0.5, 45] bandpass   (blocked associative scan)
    -> split 20 s trials into 4 x 5 s chunks (F-order semantics)
    -> keep listening classes, labels -> 0..4

F-order reshape semantics (the trickiest parity hazard, SURVEY.md §7.3) are
reproduced with explicit C-order transposes, verified element-wise against a
numpy/scipy oracle in tests/test_eeg_ingest.py.

Label quirk: the reference's torch path leaves labels as raw one-hot row
indices {1,3,5,7,9} (`Dataload_eeg.py:152`), which silently breaks its own
5-class split; its Keras path (`CNN_EEG_tf.py` cell, ``aa[selected_classes,:]``)
remaps them to 0..4 — and the published per-subject pickles contain 0..4.
We implement the remap (position within ``selected_classes``).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eav_tpu.core.config import EEGPreprocConfig
from eav_tpu.ingest import mat5
from eav_tpu.ops.signal import bandpass_sos, resample_poly


def flatten_trials(x: jnp.ndarray) -> jnp.ndarray:
    """(ch, t, tri) -> (ch, t*tri) with MATLAB F-order semantics: per channel,
    trials concatenated along time (out[c, t + T*r] = x[c, t, r]).
    Reference `Dataload_eeg.py:94`."""
    ch, t, tri = x.shape
    return jnp.transpose(x, (0, 2, 1)).reshape(ch, tri * t)


def unflatten_trials(x: jnp.ndarray, t: int) -> jnp.ndarray:
    """(ch, t*tri) -> (ch, t, tri); inverse of :func:`flatten_trials`."""
    ch, n = x.shape
    tri = n // t
    return jnp.transpose(x.reshape(ch, tri, t), (0, 2, 1))


def chunk_trials(x: jnp.ndarray, chunk_len: int) -> jnp.ndarray:
    """(ch, t, tri) -> (ch, chunk_len, n_chunks*tri) with F-order semantics:
    out[c, u, k + n_chunks*r] = x[c, u + chunk_len*k, r]
    (reference `Dataload_eeg.py:133-136`, 20 s -> 4 x 5 s)."""
    ch, t, tri = x.shape
    k = t // chunk_len
    x4 = x.reshape(ch, k, chunk_len, tri)
    return jnp.transpose(x4, (0, 2, 3, 1)).reshape(ch, chunk_len, tri * k)


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_eeg(
    seg: jnp.ndarray, cfg: EEGPreprocConfig = EEGPreprocConfig()
) -> jnp.ndarray:
    """Fused downsample + bandpass + chunk. ``seg``: (ch, t_orig, trials)
    continuous 500 Hz data. Returns (ch, samples_per_chunk, trials*chunks).

    ``cfg.filter_before_downsample`` selects the Keras-notebook ordering
    (bandpass at fs_orig, then resample — C8/C16) instead of the torch
    pipeline's (resample, then bandpass at fs_target)."""
    ch, t, tri = seg.shape
    down = cfg.fs_orig // cfg.fs_target
    flat = flatten_trials(seg)
    if cfg.filter_before_downsample:
        flat = bandpass_sos(
            flat, cfg.band[0], cfg.band[1], float(cfg.fs_orig), cfg.butter_order
        )
        flat = resample_poly(flat, up=1, down=down)
    else:
        flat = resample_poly(flat, up=1, down=down)
        # The reference re-flattens for the bandpass (`Dataload_eeg.py:110`);
        # flatten/unflatten round-trip exactly, so filter the flat stream.
        flat = bandpass_sos(
            flat, cfg.band[0], cfg.band[1], float(cfg.fs_target), cfg.butter_order
        )
    x = unflatten_trials(flat, t // down)
    return chunk_trials(x, cfg.samples_per_chunk)


def select_classes(
    data: np.ndarray, onehot: np.ndarray, selected: Tuple[int, ...]
) -> Tuple[np.ndarray, np.ndarray]:
    """Keep columns whose one-hot argmax row is in ``selected``; remap labels
    to positions 0..len(selected)-1. ``data``: (ch, t, cols); ``onehot``:
    (rows, cols) already repeated to match cols.
    Returns (trials, ch, t) and (trials,) int labels."""
    row = np.argmax(np.asarray(onehot), axis=0)
    mask = np.isin(row, selected)
    remap = {c: i for i, c in enumerate(selected)}
    labels = np.array([remap[r] for r in row[mask]], dtype=np.int32)
    x = np.transpose(np.asarray(data)[:, :, mask], (2, 0, 1))
    return x, labels


class DataLoadEEG:
    """Per-subject EEG loader with the reference's public interface
    (`Dataload_eeg.py:154-160`): ``prepare_data() -> (x, y)``."""

    def __init__(
        self,
        subject: int = 1,
        config: EEGPreprocConfig = EEGPreprocConfig(),
        parent_directory: str = "./Datasets/EAV",
        dtype=jnp.float32,
    ):
        self.subject = subject
        self.cfg = config
        self.parent_directory = parent_directory
        self.dtype = dtype

    def _paths(self) -> Tuple[str, str]:
        s = f"subject{self.subject:02d}"
        folder = os.path.join(self.parent_directory, s, "EEG")
        return (
            os.path.join(folder, f"{s}_eeg.mat"),
            os.path.join(folder, f"{s}_eeg_label.mat"),
        )

    def load_mat(self) -> Tuple[np.ndarray, np.ndarray]:
        eeg_path, label_path = self._paths()
        from eav_tpu.ingest import native

        if native.available():
            try:  # some subjects store the signal under 'seg1' (`:71-74`)
                cnt = native.read_mat_var(eeg_path, "seg1")
            except IOError:
                cnt = native.read_mat_var(eeg_path, "seg")
            label = native.read_mat_var(label_path, "label")
        else:
            mat = mat5.loadmat(eeg_path)
            cnt = mat.get("seg1", mat.get("seg"))
            if cnt is None:
                raise KeyError(f"{eeg_path}: no 'seg'/'seg1' variable")
            label = mat5.loadmat(label_path)["label"]
        # (t, ch, tri) -> (ch, t, tri)  (`Dataload_eeg.py:82`)
        return np.transpose(cnt, (1, 0, 2)), label

    def prepare_data(self) -> Tuple[np.ndarray, np.ndarray]:
        seg, label = self.load_mat()
        return self.prepare_from_arrays(seg, label)

    def prepare_from_arrays(
        self, seg: np.ndarray, label: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(ch, t, tri) raw 500 Hz + (rows, tri) one-hot -> (trials, ch, t') + labels."""
        cfg = self.cfg
        processed = preprocess_eeg(jnp.asarray(seg, self.dtype), cfg)
        processed = np.asarray(processed)
        onehot_rep = np.repeat(np.asarray(label), cfg.chunks_per_trial, axis=1)
        return select_classes(processed, onehot_rep, cfg.selected_classes)
