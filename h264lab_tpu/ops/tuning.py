"""Rate-distortion tuning constants, collected in one place.

The reference keeps its empirically-fitted RD tables behind the
`ADJUSTABLE` macro so an external training app can re-fit them
(`src/h264-lab.h:787-790`, deadzones/thresholds/lambdas `:989-1120`).
These are this encoder's equivalents; re-fit them against the RD-parity
harness (tests/rd_compare.py).
"""

# quantizer deadzone rounding, in 1/256ths of the quantization step
# (reference `g_rnd_inter`-class tables, `src/h264-lab.h:989-1046`)
INTRA_DEADZONE_Q8 = 85
INTER_DEADZONE_Q8 = 43

# mode-decision side-info bit charges (lambda-weighted), reference
# lambda/cost experiment log `src/h264-lab.h:4862-4874`
INTRA_IN_P_PENALTY_BITS = 24
I4_PENALTY_BITS = 16          # base syntax overhead of an Intra_4x4 MB
PART_16X8_PENALTY_BITS = 12   # extra MVD/sub-type syntax per 2-part shape
PART_8X8_PENALTY_BITS = 30    # and per 4-part shape

# early-skip bias (reference `g_skip_thr_inter`-class gates,
# `src/h264-lab.h:5306-5350`): a sub-pel ME position equal to the spatial
# predictor whose SAD is below SKIP_THR_BASE + qp * SKIP_THR_QP gets a
# SKIP_BIAS_BITS bits bonus — steering the search toward exactly-skippable
# MVs. The authoritative skip decision (cbp==0 and mv==exact skip
# predictor, chroma included — the reference's chroma confirmation) is
# made in the post-scan symbolization (models/mbscan.py).
SKIP_THR_BASE = 0
SKIP_THR_QP = 8
SKIP_BIAS_BITS = 10           # ~ saved mb_type/cbp/mvd syntax of a skip MB
