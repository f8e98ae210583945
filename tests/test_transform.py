"""Kernel-level golden tests: batched JAX transform/quant ops vs scalar
numpy spec models (SURVEY.md §4 test pyramid, level 1)."""

import numpy as np
import pytest

from tests import golden


@pytest.fixture(scope="module")
def ops():
    from h264lab_tpu.ops import transform
    return transform


def rand_res(rng, n):
    return rng.integers(-255, 256, size=(n, 4, 4), dtype=np.int64).astype(np.int32)


def test_fdct_matches_golden(ops):
    rng = np.random.default_rng(0)
    res = rand_res(rng, 64)
    out = np.asarray(ops.fdct4x4(res))
    ref = np.stack([golden.fdct4x4(r) for r in res])
    np.testing.assert_array_equal(out, ref)


def test_idct_matches_golden(ops):
    rng = np.random.default_rng(1)
    coef = rng.integers(-2000, 2000, size=(64, 4, 4)).astype(np.int32)
    out = np.asarray(ops.idct4x4(coef))
    ref = np.stack([golden.idct4x4(c) for c in coef])
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("qp", [10, 20, 26, 33, 40, 51])
def test_quant_dequant_matches_golden(ops, qp):
    rng = np.random.default_rng(qp)
    res = rand_res(rng, 32)
    coef = np.stack([golden.fdct4x4(r) for r in res])
    dz = 85  # ~1/3 in Q8
    lev = np.asarray(ops.quant4x4(coef, qp, dz))
    lev_ref = np.stack([golden.quant4x4(c, qp, dz) for c in coef])
    np.testing.assert_array_equal(lev, lev_ref)
    deq = np.asarray(ops.dequant4x4(lev, qp))
    deq_ref = np.stack([golden.dequant4x4(l, qp) for l in lev_ref])
    np.testing.assert_array_equal(deq, deq_ref)


@pytest.mark.parametrize("qp", [10, 11, 12, 26, 38, 51])
def test_luma_dc_roundtrip(ops, qp):
    rng = np.random.default_rng(qp * 7)
    dc = rng.integers(-4000, 4000, size=(16, 4, 4)).astype(np.int32)
    lev = np.asarray(ops.quant_luma_dc(dc, qp))
    lev_ref = np.stack([golden.quant_luma_dc(d, qp) for d in dc])
    np.testing.assert_array_equal(lev, lev_ref)
    deq = np.asarray(ops.dequant_luma_dc(lev, qp))
    deq_ref = np.stack([golden.dequant_luma_dc(l, qp) for l in lev_ref])
    np.testing.assert_array_equal(deq, deq_ref)


@pytest.mark.parametrize("qpc", [10, 11, 26, 39])
def test_chroma_dc_roundtrip(ops, qpc):
    rng = np.random.default_rng(qpc * 13)
    dc = rng.integers(-4000, 4000, size=(16, 2, 2)).astype(np.int32)
    lev = np.asarray(ops.quant_chroma_dc(dc, qpc))
    lev_ref = np.stack([golden.quant_chroma_dc(d, qpc) for d in dc])
    np.testing.assert_array_equal(lev, lev_ref)
    deq = np.asarray(ops.dequant_chroma_dc(lev, qpc))
    deq_ref = np.stack([golden.dequant_chroma_dc(l, qpc) for l in lev_ref])
    np.testing.assert_array_equal(deq, deq_ref)


def test_recon_bounds(ops):
    """End-to-end TQ→recon keeps uint8 range and reduces distortion."""
    rng = np.random.default_rng(5)
    inp = rng.integers(0, 256, size=(32, 4, 4)).astype(np.uint8)
    pred = rng.integers(0, 256, size=(32, 4, 4)).astype(np.uint8)
    levels, deq, _ = ops.transform_quant_dequant_recon(inp, pred, 26, 85)
    recon = np.asarray(ops.recon_from_deq(deq, pred))
    assert recon.dtype == np.uint8
    err_recon = np.abs(recon.astype(int) - inp.astype(int)).mean()
    err_pred = np.abs(pred.astype(int) - inp.astype(int)).mean()
    assert err_recon < err_pred


def test_idct_of_dequant_high_qp_zero_levels(ops):
    """All-zero levels must reconstruct the prediction exactly."""
    zero = np.zeros((4, 4, 4), dtype=np.int32)
    pred = np.full((4, 4, 4), 77, dtype=np.uint8)
    recon = np.asarray(ops.recon_from_deq(zero, pred))
    np.testing.assert_array_equal(recon, pred)
