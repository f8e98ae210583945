"""Batched 9-mode intra-4x4 predictors vs scalar golden."""

import numpy as np
import pytest

from h264lab_tpu.decoder.intra_pred import pred4


@pytest.fixture(scope="module")
def i4():
    from h264lab_tpu.ops import intra4
    return intra4


def test_all_modes_match_golden(i4):
    rng = np.random.default_rng(0)
    k = 64
    t = rng.integers(0, 256, (k, 4)).astype(np.int32)
    l = rng.integers(0, 256, (k, 4)).astype(np.int32)
    tl = rng.integers(0, 256, (k,)).astype(np.int32)
    tr = rng.integers(0, 256, (k, 4)).astype(np.int32)
    ones = np.ones(k, bool)
    preds, valid = i4.predict4(t, l, tl, tr, ones, ones, ones)
    preds = np.asarray(preds)
    assert np.asarray(valid).all()
    for mode in range(9):
        for i in range(k):
            want = pred4(mode, t[i], l[i], tl[i], tr[i])
            got = preds[i, mode]
            np.testing.assert_array_equal(
                got, want, err_msg=f"mode {mode} sample {i}")


def test_validity_mask(i4):
    k = 4
    t = np.zeros((k, 4), np.int32)
    l = np.zeros((k, 4), np.int32)
    tl = np.zeros((k,), np.int32)
    tr = np.zeros((k, 4), np.int32)
    at = np.array([True, False, True, False])
    al = np.array([True, True, False, False])
    atl = at & al
    _, valid = i4.predict4(t, l, tl, tr, at, al, atl)
    valid = np.asarray(valid)
    # DC always valid; V needs top; H needs left; DDR needs all three
    assert valid[:, 2].all()
    np.testing.assert_array_equal(valid[:, 0], at)
    np.testing.assert_array_equal(valid[:, 1], al)
    np.testing.assert_array_equal(valid[:, 4], at & al & atl)
