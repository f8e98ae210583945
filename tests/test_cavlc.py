"""CAVLC device op vs scalar golden model (random blocks, all contexts)."""

import numpy as np
import pytest

from tests.golden_cavlc import encode_block_bits


def symbols_to_bits(vals, lens):
    out = []
    for v, l in zip(vals, lens):
        if l > 0:
            out.append(format(int(v), "0%db" % int(l)))
    return "".join(out)


@pytest.fixture(scope="module")
def cavlc():
    from h264lab_tpu.ops import cavlc as mod
    return mod


def _random_blocks(rng, n, max_coeff, density, mag):
    lv = np.zeros((n, 16), dtype=np.int32)
    for i in range(n):
        k = rng.integers(0, max_coeff + 1)
        pos = rng.choice(max_coeff, size=min(k, int(density * max_coeff) + 1),
                         replace=False)
        lv[i, pos] = rng.integers(-mag, mag + 1, size=len(pos))
    return lv


@pytest.mark.parametrize("max_coeff,nc_choices", [
    (16, [0, 1, 2, 3, 4, 7, 8, 20]),
    (15, [0, 1, 3, 5, 9]),
    (4, [-1]),
])
def test_cavlc_matches_golden(cavlc, max_coeff, nc_choices):
    rng = np.random.default_rng(max_coeff)
    n = 160
    lv = _random_blocks(rng, n, max_coeff, 0.5, 9)
    # make some rows trailing-one-rich and some empty
    lv[:10] = 0
    lv[10, :3] = [1, -1, 1]
    nc = rng.choice(nc_choices, size=n).astype(np.int32)
    vals, lens, total = cavlc.encode_blocks(lv, nc, max_coeff)
    vals = np.asarray(vals)
    lens = np.asarray(lens)
    for i in range(n):
        got = symbols_to_bits(vals[i], lens[i])
        want = encode_block_bits(lv[i], int(nc[i]), max_coeff)
        assert got == want, f"row {i}: {lv[i]} nc={nc[i]}\n got {got}\nwant {want}"


def test_cavlc_large_levels(cavlc):
    """Escape codes: large magnitudes exercise prefix-14/15/16 paths."""
    cases = np.zeros((6, 16), dtype=np.int32)
    cases[0, 0] = 8
    cases[1, 0] = 20     # sl=0 escape 14
    cases[2, 0] = 300    # sl=0 escape 15
    cases[3, 0] = 3000   # sl=0 deep escape
    cases[4, :2] = [900, -800]
    cases[5, :4] = [700, 600, -500, 400]
    nc = np.zeros(6, dtype=np.int32)
    vals, lens, _ = cavlc.encode_blocks(cases, nc, 16)
    vals = np.asarray(vals)
    lens = np.asarray(lens)
    for i in range(6):
        got = symbols_to_bits(vals[i], lens[i])
        want = encode_block_bits(cases[i], 0, 16)
        assert got == want, f"case {i}"
