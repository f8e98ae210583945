"""Scalar golden CAVLC encoder, written independently from spec 9.2
pseudocode (shares only the numeric VLC tables with the device op)."""

from __future__ import annotations

import numpy as np

from h264lab_tpu.ops import tables_cavlc as tc


def encode_block_bits(levels, nC, max_coeff) -> str:
    """Return the bit string for one residual block (spec 9.2)."""
    lv = [int(x) for x in levels[:max_coeff]]
    nz = [(i, v) for i, v in enumerate(lv) if v != 0]
    total = len(nz)
    # reverse scan order
    rev = nz[::-1]
    t1 = 0
    for i, v in rev[:3]:
        if abs(v) == 1:
            t1 += 1
        else:
            break
    ctx = 4 if nC < 0 else (0 if nC < 2 else 1 if nC < 4 else 2 if nC < 8 else 3)
    ln = int(tc.COEFF_TOKEN_LEN[ctx, total, t1])
    vl = int(tc.COEFF_TOKEN_VAL[ctx, total, t1])
    assert ln > 0
    bits = format(vl, "0%db" % ln)

    for i, v in rev[:t1]:
        bits += "1" if v < 0 else "0"

    sl = 1 if (total > 10 and t1 < 3) else 0
    for idx, (i, v) in enumerate(rev[t1:]):
        lc = 2 * (abs(v) - 1) + (1 if v < 0 else 0)
        if idx == 0 and t1 < 3:
            lc -= 2
        if sl == 0 and lc < 14:
            bits += "0" * lc + "1"
        elif sl == 0 and lc < 30:
            bits += "0" * 14 + "1" + format(lc - 14, "04b")
        elif sl > 0 and (lc >> sl) < 15:
            bits += "0" * (lc >> sl) + "1" + format(lc & ((1 << sl) - 1),
                                                    "0%db" % sl)
        else:
            rem = lc - (15 << sl) - (15 if sl == 0 else 0)
            if rem < 4096:
                bits += "0" * 15 + "1" + format(rem, "012b")
            else:
                bits += "0" * 16 + "1" + format(rem - 4096, "013b")
        if sl == 0:
            sl = 1
        if abs(v) > (3 << (sl - 1)):
            sl = min(sl + 1, 6)

    if 0 < total < max_coeff:
        tz = rev[0][0] + 1 - total
        if max_coeff == 4:
            bits += format(int(tc.TOTAL_ZEROS_CDC_VAL[total, tz]),
                           "0%db" % int(tc.TOTAL_ZEROS_CDC_LEN[total, tz]))
        else:
            bits += format(int(tc.TOTAL_ZEROS_VAL[total, tz]),
                           "0%db" % int(tc.TOTAL_ZEROS_LEN[total, tz]))
        zeros_left = tz
        for k in range(total - 1):
            if zeros_left <= 0:
                break
            run = rev[k][0] - rev[k + 1][0] - 1
            zl = min(zeros_left, 7)
            bits += format(int(tc.RUN_BEFORE_VAL[zl, run]),
                           "0%db" % int(tc.RUN_BEFORE_LEN[zl, run]))
            zeros_left -= run
    return bits
