"""Metrics parity vs sklearn (the reference's metric library)."""

import numpy as np
import pytest

from eav_tpu.core.metrics import (
    accuracy,
    classification_summary,
    confusion_matrix,
    trial_vote,
    weighted_f1,
)

sklearn_metrics = pytest.importorskip("sklearn.metrics")


def test_against_sklearn(rng):
    y_true = rng.integers(0, 5, size=300)
    y_pred = rng.integers(0, 5, size=300)
    assert float(accuracy(y_true, y_pred)) == pytest.approx(
        sklearn_metrics.accuracy_score(y_true, y_pred)
    )
    assert float(weighted_f1(y_true, y_pred, 5)) == pytest.approx(
        sklearn_metrics.f1_score(y_true, y_pred, average="weighted"), abs=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(confusion_matrix(y_true, y_pred, 5)),
        sklearn_metrics.confusion_matrix(y_true, y_pred, labels=range(5)),
    )


def test_weighted_f1_with_missing_class(rng):
    # A class absent from y_pred must not produce NaN (sklearn zero_division=0).
    y_true = np.array([0, 0, 1, 1, 2, 2])
    y_pred = np.array([0, 0, 1, 1, 1, 1])
    ours = float(weighted_f1(y_true, y_pred, 5))
    ref = sklearn_metrics.f1_score(y_true, y_pred, average="weighted")
    assert ours == pytest.approx(ref, abs=1e-6)


def test_trial_vote_matches_reference_semantics(rng):
    # Reference Transformer_Vision.py:178-180: reshape (200,25,5) C-order,
    # mean over frames, argmax.
    logits = rng.normal(size=(200 * 25, 5)).astype(np.float32)
    tl, pred = trial_vote(logits, 25)
    ref = logits.reshape(200, 25, 5).mean(axis=1)
    np.testing.assert_allclose(np.asarray(tl), ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pred), ref.argmax(axis=1))


def test_summary_dict(rng):
    y = rng.integers(0, 5, size=100)
    s = classification_summary(y, y, 5)
    assert s["accuracy"] == 1.0 and s["weighted_f1"] == pytest.approx(1.0)
