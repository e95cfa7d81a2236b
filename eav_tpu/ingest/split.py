"""Deterministic class-stratified train/test split.

Behavioral equivalent of the reference ``EAVDataSplit``
(`EAV_datasplit.py:7-58`): samples are grouped by class *preserving dataset
order* (which is temporal order for EAV), the first ``h_idx`` samples of each
class become train, the rest test. With 80 samples/class, ``h_idx=56`` gives
the published 70/30 split and ``h_idx=40`` the notebooks' 50/50 split.

Implemented as a pure index computation so the same split can be applied to
any number of aligned arrays (features, labels, trial ids) without copies
until the final gather.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from eav_tpu.core.config import SplitConfig


def split_indices(
    y: np.ndarray, h_idx: int = 56, num_classes: int = 5
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (train_idx, test_idx) into ``y``.

    Order matches the reference exactly: train/test are each the
    concatenation over class 0..num_classes-1 of that class's in-order
    indices (reference `EAV_datasplit.py:29-32`).
    """
    y = np.asarray(y).reshape(-1)
    train_parts, test_parts = [], []
    for c in range(num_classes):
        cls_idx = np.flatnonzero(y == c)
        train_parts.append(cls_idx[:h_idx])
        test_parts.append(cls_idx[h_idx:])
    return np.concatenate(train_parts), np.concatenate(test_parts)


def eav_split(
    x: np.ndarray,
    y: np.ndarray,
    h_idx: int = 56,
    num_classes: int = 5,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(x, y) -> (tr_x, tr_y, te_x, te_y), the universal 4-tuple contract."""
    x = np.asarray(x)
    y = np.asarray(y).reshape(-1)
    tr_idx, te_idx = split_indices(y, h_idx=h_idx, num_classes=num_classes)
    # The reference squeezes feature arrays on the way out
    # (`EAV_datasplit.py:35-36`).
    return (
        np.squeeze(x[tr_idx]),
        y[tr_idx],
        np.squeeze(x[te_idx]),
        y[te_idx],
    )


class EAVDataSplit:
    """Drop-in style wrapper mirroring the reference class's API."""

    def __init__(self, x, y, config: SplitConfig | None = None):
        self.x = np.asarray(x)
        self.y = np.asarray(y).reshape(-1)
        self.config = config or SplitConfig()

    def get_split(self, h_idx: int | None = None):
        h = self.config.h_idx if h_idx is None else h_idx
        return eav_split(self.x, self.y, h_idx=h, num_classes=self.config.num_classes)
