"""Classification metrics in pure jnp/numpy (no sklearn on the device path).

The reference computes accuracy / weighted F1 / confusion with sklearn on host
(`CNN_tensorflow/CNN_EEG_tf.py:135-142`, `CNN_torch/CNN_Vision.py:205-207`).
Here the same quantities are jit-able jnp so eval stays on device; numpy
mirrors are provided for host-side aggregation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(y_true, y_pred, num_classes: int):
    """(num_classes, num_classes) count matrix, rows = true, cols = pred."""
    y_true = jnp.asarray(y_true).reshape(-1)
    y_pred = jnp.asarray(y_pred).reshape(-1)
    idx = y_true * num_classes + y_pred
    counts = jnp.bincount(idx, length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes)


def accuracy(y_true, y_pred) -> jnp.ndarray:
    y_true = jnp.asarray(y_true).reshape(-1)
    y_pred = jnp.asarray(y_pred).reshape(-1)
    return jnp.mean((y_true == y_pred).astype(jnp.float32))


def f1_scores_from_confusion(cm) -> jnp.ndarray:
    """Per-class F1 from a confusion matrix; zero where undefined
    (matches sklearn's zero_division=0 behavior used implicitly by the
    reference's `f1_score(average='weighted')`)."""
    cm = jnp.asarray(cm, jnp.float32)
    tp = jnp.diag(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    denom = 2 * tp + fp + fn
    return jnp.where(denom > 0, 2 * tp / jnp.where(denom > 0, denom, 1.0), 0.0)


def weighted_f1(y_true, y_pred, num_classes: int) -> jnp.ndarray:
    """sklearn ``f1_score(average='weighted')`` equivalent."""
    cm = confusion_matrix(y_true, y_pred, num_classes)
    f1 = f1_scores_from_confusion(cm)
    support = jnp.asarray(cm, jnp.float32).sum(axis=1)
    total = support.sum()
    return jnp.where(total > 0, jnp.sum(f1 * support) / jnp.where(total > 0, total, 1.0), 0.0)


def classification_summary(y_true, y_pred, num_classes: int) -> dict:
    """Host-side summary dict (numpy scalars) for metrics JSONL."""
    cm = np.asarray(confusion_matrix(y_true, y_pred, num_classes))
    acc = float(np.asarray(accuracy(y_true, y_pred)))
    wf1 = float(np.asarray(weighted_f1(y_true, y_pred, num_classes)))
    return {"accuracy": acc, "weighted_f1": wf1, "confusion": cm.tolist()}


def trial_vote(logits, group: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-trial aggregation: mean logits over ``group`` consecutive rows,
    then argmax (reference `Transformer_Vision.py:178-180`).

    Returns (trial_logits, trial_pred)."""
    logits = jnp.asarray(logits)
    n, c = logits.shape
    trials = n // group
    tl = logits[: trials * group].reshape(trials, group, c).mean(axis=1)
    return tl, jnp.argmax(tl, axis=-1)


def trial_majority_vote(logits, group: int, num_classes: int) -> jnp.ndarray:
    """Per-trial majority vote over per-frame argmax predictions — the Keras
    video notebook's aggregation (`scipy.stats.mode` over frame blocks, C15
    cell0:168-177). Ties resolve to the smallest class index, matching scipy.

    Returns (trials,) predictions."""
    logits = jnp.asarray(logits)
    n, _ = logits.shape
    trials = n // group
    frame_pred = jnp.argmax(logits[: trials * group], axis=-1).reshape(trials, group)
    onehot = jax.nn.one_hot(frame_pred, num_classes, dtype=jnp.int32)
    counts = onehot.sum(axis=1)
    return jnp.argmax(counts, axis=-1)  # argmax takes first max == smallest class
