"""Split parity: our index-based split must reproduce the reference
`EAV_datasplit.EAVDataSplit.get_split` semantics exactly."""

import numpy as np

from eav_tpu.ingest.split import EAVDataSplit, eav_split, split_indices


def _reference_split(x, y, h_idx):
    """Independent oracle implementing EAV_datasplit.py:12-40 semantics."""
    x, y = np.asarray(x), np.asarray(y)
    feats, labs = [], []
    for c in range(5):
        m = np.where(y == c)
        feats.append(x[m])
        labs.append(y[m])
    tr_x = np.concatenate([f[:h_idx] for f in feats], axis=0)
    te_x = np.concatenate([f[h_idx:] for f in feats], axis=0)
    tr_y = np.concatenate([l[:h_idx] for l in labs], axis=0)
    te_y = np.concatenate([l[h_idx:] for l in labs], axis=0)
    return np.squeeze(tr_x), tr_y, np.squeeze(te_x), te_y


def test_split_matches_reference_semantics(rng):
    # EAV layout: interleaved classes, 80 per class, in temporal order.
    y = np.tile(np.arange(5), 80)[rng.permutation(400)]
    x = rng.normal(size=(400, 30, 500)).astype(np.float32)
    for h in (40, 56):
        ours = eav_split(x, y, h_idx=h)
        ref = _reference_split(x, y, h)
        for a, b in zip(ours, ref):
            np.testing.assert_array_equal(a, b)


def test_split_shapes_70_30(rng):
    y = np.repeat(np.arange(5), 80)
    x = rng.normal(size=(400, 8))
    tr_x, tr_y, te_x, te_y = EAVDataSplit(x, y).get_split(h_idx=56)
    assert tr_x.shape == (280, 8) and te_x.shape == (120, 8)
    assert [int((tr_y == c).sum()) for c in range(5)] == [56] * 5
    assert [int((te_y == c).sum()) for c in range(5)] == [24] * 5


def test_split_is_in_order(rng):
    # First h_idx of each class (temporal order) must land in train.
    y = np.tile(np.arange(5), 80)
    x = np.arange(400)[:, None] * np.ones((1, 3))
    tr_idx, te_idx = split_indices(y, h_idx=56)
    for c in range(5):
        cls_positions = np.flatnonzero(y == c)
        assert set(tr_idx[c * 56 : (c + 1) * 56]) == set(cls_positions[:56])
        assert (np.diff(tr_idx[c * 56 : (c + 1) * 56]) > 0).all()
