"""Intra 4x4 prediction: all 9 spec modes (8.3.1.2), batched.

Reference equivalent: `h264e_intra_choose_4x4` (`src/h264-lab.h:1810-1962`)
— fused 9-mode predict+select per block. Here each block's 13 neighbour
samples are gathered from a per-MB canvas and all 9 predictions are
produced as one (k, 9, 4, 4) tensor; selection is a masked SAD argmin with
mode-bit costs.

Within-MB data flow: blocks depend on left/top/top-right reconstructed
neighbours *in coded (quadrant) order*; the 16 blocks schedule into 10
dependency groups (GROUPS below), processed as statically unrolled
sub-steps of the frame wavefront. Blocks listed per group by raster index.

Top-right availability: in coded order the above-right neighbour of
raster blocks {5, 7, 11, 13, 15} is not yet decoded (and column-3 blocks
have it outside the MB); the spec substitutes the rightmost top sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from h264lab_tpu.ops import transform

# dependency groups of raster block indices (see module docstring)
GROUPS = (
    (0,), (1,), (2, 4), (3, 5), (6, 8), (7, 9), (10, 12), (11, 13),
    (14,), (15,),
)

# raster blocks whose top-right neighbour must be replicated from the
# rightmost top sample (never available in coded order / outside MB rows)
NO_TOPRIGHT = frozenset({5, 7, 11, 13, 15})

N_MODES = 9
(M_V, M_H, M_DC, M_DDL, M_DDR, M_VR, M_HD, M_VL, M_HU) = range(9)


def predict4(top: jnp.ndarray, left: jnp.ndarray, tl: jnp.ndarray,
             tr: jnp.ndarray, avail_top: jnp.ndarray,
             avail_left: jnp.ndarray, avail_tl: jnp.ndarray):
    """All 9 predictions for a batch of 4x4 blocks.

    Args:
      top: (k, 4) int32 samples p[0..3,-1]; left: (k, 4) p[-1,0..3];
      tl: (k,) p[-1,-1]; tr: (k, 4) p[4..7,-1] (already replicated when
      the true top-right is unavailable); avail_*: (k,) bool.

    Returns (k, 9, 4, 4) int32 predictions and (k, 9) validity mask.
    """
    k = top.shape[0]
    t = top.astype(jnp.int32)
    l = left.astype(jnp.int32)
    tl = tl.astype(jnp.int32)
    tr = tr.astype(jnp.int32)

    # p[-1..7] top row including top-left and top-right: index 0 = tl
    p = jnp.concatenate([tl[:, None], t, tr], axis=1)     # (k, 9): p[-1],p0..p7

    def at(i):
        return p[:, i + 1]

    zero = jnp.zeros((k, 4, 4), jnp.int32)

    # mode 0: vertical
    pred_v = jnp.broadcast_to(t[:, None, :], (k, 4, 4))
    # mode 1: horizontal
    pred_h = jnp.broadcast_to(l[:, :, None], (k, 4, 4))
    # mode 2: DC
    sum_t = jnp.sum(t, axis=1)
    sum_l = jnp.sum(l, axis=1)
    dc = jnp.where(avail_top & avail_left, (sum_t + sum_l + 4) >> 3,
                   jnp.where(avail_top, (sum_t + 2) >> 2,
                             jnp.where(avail_left, (sum_l + 2) >> 2, 128)))
    pred_dc = jnp.broadcast_to(dc[:, None, None], (k, 4, 4))

    # helper grids
    yy = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (4, 4), 1)

    # mode 3: diagonal down-left (spec 8.3.1.2.4)
    # pred[y,x] = (p[x+y] + 2*p[x+y+1] + p[x+y+2] + 2) >> 2, clamped at 7
    idx = jnp.minimum(xx + yy, 6)
    a = jnp.take(p, idx.ravel() + 1, axis=1).reshape(k, 4, 4)
    b = jnp.take(p, jnp.minimum(idx + 1, 7).ravel() + 1, axis=1).reshape(k, 4, 4)
    c = jnp.take(p, jnp.minimum(idx + 2, 7).ravel() + 1, axis=1).reshape(k, 4, 4)
    ddl = (a + 2 * b + c + 2) >> 2
    # special bottom-right: (p6 + 3*p7 + 2) >> 2
    br_val = (at(6) + 3 * at(7) + 2) >> 2
    pred_ddl = jnp.where((xx == 3) & (yy == 3), br_val[:, None, None], ddl)

    # mode 4: diagonal down-right — build extended array
    # q[i] for i in -4..7 mapping: left[3-?]... define e: e[0..3]=l[3],l[2],l[1],l[0]? spec uses
    # zVR-like indexing; construct along the anti-border vector:
    # v = [l3, l2, l1, l0, tl, t0, t1, t2, t3]  (index 0..8, center 4 = tl)
    v = jnp.concatenate([l[:, ::-1], tl[:, None], t], axis=1)   # (k, 9)
    d = xx - yy  # -3..3
    i0 = d + 4
    a = jnp.take(v, (i0 - 1).ravel(), axis=1).reshape(k, 4, 4)
    b = jnp.take(v, i0.ravel(), axis=1).reshape(k, 4, 4)
    c = jnp.take(v, (i0 + 1).ravel(), axis=1).reshape(k, 4, 4)
    pred_ddr = (a + 2 * b + c + 2) >> 2

    # mode 5: vertical right (spec 8.3.1.2.6), zVR = 2x - y.
    # v[4] = p[-1,-1], v[5] = p[0,-1]; t[i] = v[i+5], l[i] = v[3-i].
    zvr = 2 * xx - yy
    xm = xx - (yy >> 1)
    iv = xm + 5   # v index of t[xm]
    a = jnp.take(v, jnp.clip(iv - 2, 0, 8).ravel(), axis=1).reshape(k, 4, 4)
    b = jnp.take(v, jnp.clip(iv - 1, 0, 8).ravel(), axis=1).reshape(k, 4, 4)
    c = jnp.take(v, jnp.clip(iv, 0, 8).ravel(), axis=1).reshape(k, 4, 4)
    even = (b + c + 1) >> 1                 # (t[xm-1] + t[xm] + 1) >> 1
    odd = (a + 2 * b + c + 2) >> 2          # (t[xm-2] + 2t[xm-1] + t[xm])
    # zVR < 0 (positions (0,1),(1,3),(0,2),(0,3)): centered at v[5+zVR]
    neg_i = 5 + zvr
    na = jnp.take(v, jnp.clip(neg_i - 1, 0, 8).ravel(), axis=1).reshape(k, 4, 4)
    nb = jnp.take(v, jnp.clip(neg_i, 0, 8).ravel(), axis=1).reshape(k, 4, 4)
    nc = jnp.take(v, jnp.clip(neg_i + 1, 0, 8).ravel(), axis=1).reshape(k, 4, 4)
    neg = (na + 2 * nb + nc + 2) >> 2
    pred_vr = jnp.where(zvr >= 0, jnp.where(zvr % 2 == 0, even, odd), neg)

    # mode 6: horizontal down (spec 8.3.1.2.7), zHD = 2y - x — the
    # transpose of VR on the mirrored vector w (w[4]=tl, w[5]=l0).
    zhd = 2 * yy - xx
    ym = yy - (xx >> 1)
    w = jnp.concatenate([t[:, ::-1], tl[:, None], l], axis=1)
    iw = ym + 5
    a = jnp.take(w, jnp.clip(iw - 2, 0, 8).ravel(), axis=1).reshape(k, 4, 4)
    b = jnp.take(w, jnp.clip(iw - 1, 0, 8).ravel(), axis=1).reshape(k, 4, 4)
    c = jnp.take(w, jnp.clip(iw, 0, 8).ravel(), axis=1).reshape(k, 4, 4)
    even = (b + c + 1) >> 1
    odd = (a + 2 * b + c + 2) >> 2
    neg_i = 5 + zhd
    na = jnp.take(w, jnp.clip(neg_i - 1, 0, 8).ravel(), axis=1).reshape(k, 4, 4)
    nb = jnp.take(w, jnp.clip(neg_i, 0, 8).ravel(), axis=1).reshape(k, 4, 4)
    nc = jnp.take(w, jnp.clip(neg_i + 1, 0, 8).ravel(), axis=1).reshape(k, 4, 4)
    neg = (na + 2 * nb + nc + 2) >> 2
    pred_hd = jnp.where(zhd >= 0, jnp.where(zhd % 2 == 0, even, odd), neg)

    # mode 7: vertical left (spec 8.3.1.2.8)
    xv = xx + (yy >> 1)
    a = jnp.take(p, jnp.clip(xv, 0, 7).ravel() + 1, axis=1).reshape(k, 4, 4)
    b = jnp.take(p, jnp.clip(xv + 1, 0, 7).ravel() + 1, axis=1).reshape(k, 4, 4)
    c = jnp.take(p, jnp.clip(xv + 2, 0, 7).ravel() + 1, axis=1).reshape(k, 4, 4)
    pred_vl = jnp.where(yy % 2 == 0, (a + b + 1) >> 1, (a + 2 * b + c + 2) >> 2)

    # mode 8: horizontal up (spec 8.3.1.2.9), zHU = x + 2y
    zhu = xx + 2 * yy
    yu = yy + (xx >> 1)
    la = jnp.take(l, jnp.clip(yu, 0, 3).ravel(), axis=1).reshape(k, 4, 4)
    lb = jnp.take(l, jnp.clip(yu + 1, 0, 3).ravel(), axis=1).reshape(k, 4, 4)
    lc = jnp.take(l, jnp.clip(yu + 2, 0, 3).ravel(), axis=1).reshape(k, 4, 4)
    hu_even = (la + lb + 1) >> 1
    hu_odd = (la + 2 * lb + lc + 2) >> 2
    l3 = l[:, 3][:, None, None]
    pred_hu = jnp.where(zhu > 5, l3,
                        jnp.where(zhu == 5,
                                  ((l[:, 2] + 3 * l[:, 3] + 2) >> 2)[:, None, None],
                                  jnp.where(zhu % 2 == 0, hu_even, hu_odd)))

    preds = jnp.stack([pred_v, pred_h, pred_dc, pred_ddl, pred_ddr,
                       pred_vr, pred_hd, pred_vl, pred_hu], axis=1)
    ones = jnp.ones_like(avail_top)
    valid = jnp.stack([
        avail_top, avail_left, ones,
        avail_top, avail_top & avail_left & avail_tl,
        avail_top & avail_left & avail_tl,
        avail_top & avail_left & avail_tl,
        avail_top, avail_left], axis=1)
    return preds, valid


def encode_i4x4_mb(src_mb, top_row, left_col, tl_px, tr4_px,
                   avail_top, avail_left, avail_tl, avail_tr,
                   left_modes, top_modes, qp, deadzone_q8, lam):
    """Full Intra_4x4 encode of a batch of MBs: per-block 9-mode choose,
    TQ, reconstruct — the 16 blocks processed as 10 statically-unrolled
    dependency groups (the within-MB wavefront).

    Args:
      src_mb: (k, 16, 16) uint8.
      top_row: (k, 16) recon bottom row of the MB above; left_col: (k, 16)
      right column of the left MB; tl_px: (k,) bottom-right pixel of the
      top-left MB; tr4_px: (k, 4) first 4 bottom pixels of the top-right MB.
      avail_*: (k,) bool MB-neighbour availability.
      left_modes/top_modes: (k, 4) neighbouring MBs' edge block modes
      (2 = DC when the neighbour is absent or not Intra_4x4).
      lam: scalar int lambda for mode-bit cost.

    Returns dict(levels (k,4,4,4,4) int32, recon (k,16,16) uint8,
      modes (k,16) raster int32, mode_sym_val/len (k,16) uint32/int32
      in coded block order, cost (k,) int32).
    """
    k = src_mb.shape[0]
    src = src_mb.astype(jnp.int32)
    # canvas: rows 0..16 (0 = top edge), cols 0..20 (0 = left edge,
    # 17..20 = top-right extension)
    canvas = jnp.zeros((k, 17, 21), jnp.int32)
    canvas = canvas.at[:, 0, 1:17].set(top_row.astype(jnp.int32))
    canvas = canvas.at[:, 0, 17:21].set(tr4_px.astype(jnp.int32))
    canvas = canvas.at[:, 1:17, 0].set(left_col.astype(jnp.int32))
    canvas = canvas.at[:, 0, 0].set(tl_px.astype(jnp.int32))

    # The 16 blocks run as ONE `lax.scan` body over b = 0..15 in raster
    # order — a topological order of the same left/top/top-right
    # dependencies as the coded-order GROUPS schedule (which the
    # availability masks still encode), producing identical values while
    # compiling the predict+TQ body once instead of 16 times. All
    # block-dependent indexing is table-driven dynamic slicing.
    ones = jnp.ones((k,), bool)
    bs = np.arange(16, dtype=np.int32)
    bis, bjs = bs // 4, bs % 4
    no_tr = np.isin(bs, list(NO_TOPRIGHT))
    xs = (jnp.asarray(bs), jnp.asarray(bis), jnp.asarray(bjs),
          jnp.asarray(no_tr))

    def step(carry, xt):
        canvas, modes, cost = carry
        b, bi, bj, b_no_tr = xt
        y0 = 4 * bi
        x0 = 4 * bj
        t4 = jax.lax.dynamic_slice(canvas, (0, y0, x0 + 1), (k, 1, 4))[:, 0]
        l4 = jax.lax.dynamic_slice(canvas, (0, y0 + 1, x0), (k, 4, 1))[:, :, 0]
        tlp = jax.lax.dynamic_slice(canvas, (0, y0, x0), (k, 1, 1))[:, 0, 0]
        # top-right: 4 samples right of the top edge
        tr_raw = jax.lax.dynamic_slice(canvas, (0, y0, x0 + 5), (k, 1, 4))[:, 0]

        a_top = (bi > 0) | avail_top
        a_left = (bj > 0) | avail_left
        a_tl = jnp.where(
            (bi > 0) & (bj > 0), ones,
            jnp.where((bi == 0) & (bj == 0), avail_tl,
                      jnp.where(bi == 0, avail_top, avail_left)))
        # top-right usability (spec availability in decode order)
        tr_ok = (~b_no_tr) & jnp.where(
            bi > 0, ones, jnp.where(bj == 3, avail_tr, avail_top))
        t3rep = t4[:, 3:4]
        tr4 = jnp.where(tr_ok[:, None], tr_raw,
                        jnp.broadcast_to(t3rep, tr_raw.shape))

        preds, valid = predict4(t4, l4, tlp, tr4, a_top, a_left, a_tl)

        # predicted mode from neighbour block modes (spec 8.3.1.1)
        left_of = jax.lax.dynamic_slice(
            modes, (0, jnp.maximum(b - 1, 0)), (k, 1))[:, 0]
        top_of = jax.lax.dynamic_slice(
            modes, (0, jnp.maximum(b - 4, 0)), (k, 1))[:, 0]
        from_lm = jax.lax.dynamic_slice(
            left_modes, (0, bi), (k, 1))[:, 0]
        from_tm = jax.lax.dynamic_slice(
            top_modes, (0, bj), (k, 1))[:, 0]
        mode_a = jnp.where(bj == 0, from_lm, left_of)
        mode_b = jnp.where(bi == 0, from_tm, top_of)
        avail_a = (bj > 0) | avail_left
        avail_b = (bi > 0) | avail_top
        # spec 8.3.1.1: an UNAVAILABLE neighbour block forces DC
        # prediction (dcPredModePredictedFlag); an available neighbour
        # in a non-Intra4x4 MB contributes DC (2) into the min (the
        # edge-mode arrays already carry 2 for those MBs).
        pred_mode = jnp.where(avail_a & avail_b,
                              jnp.minimum(mode_a, mode_b), 2)

        src_blk = jax.lax.dynamic_slice(src, (0, y0, x0), (k, 4, 4))
        sad = jnp.sum(jnp.abs(src_blk[:, None] - preds), axis=(2, 3))
        bits = jnp.where(jnp.arange(N_MODES)[None, :] == pred_mode[:, None],
                         1, 4)
        c = jnp.where(valid, sad + lam * bits, jnp.int32(1 << 30))
        m = jnp.argmin(c, axis=1).astype(jnp.int32)
        best = jnp.take_along_axis(
            preds, m[:, None, None, None], axis=1)[:, 0]
        cost = cost + jnp.min(c, axis=1)
        modes = jax.lax.dynamic_update_slice(modes, m[:, None], (0, b))

        # mode syntax symbol: flag(1)=1 if m==pred else 0 + rem(3)
        eq = m == pred_mode
        rem = jnp.where(m < pred_mode, m, m - 1)
        s_val = jnp.where(eq, 1, rem).astype(jnp.uint32)
        s_len = jnp.where(eq, 1, 4)

        # TQ + recon (full 16-coeff block)
        coef = transform.fdct4x4(src_blk - best)
        lev = transform.quant4x4(coef, qp, deadzone_q8)
        deq = transform.dequant4x4(lev, qp)
        res = transform.idct4x4(deq)
        rec = jnp.clip(res + best, 0, 255)
        canvas = jax.lax.dynamic_update_slice(canvas, rec,
                                              (0, y0 + 1, x0 + 1))
        return (canvas, modes, cost), (m, s_val, s_len, lev)

    carry0 = (canvas, jnp.full((k, 16), 2, jnp.int32),
              jnp.zeros((k,), jnp.int32))
    (canvas, modes, cost), (ms, s_vals, s_lens, levs) = \
        jax.lax.scan(step, carry0, xs)
    sym_val = s_vals.T                                  # (k, 16) raster
    sym_len = s_lens.T
    levels = (levs.reshape(4, 4, k, 4, 4)
              .transpose(2, 0, 1, 3, 4))                # (k, bi, bj, 4, 4)

    recon = canvas[:, 1:17, 1:17].astype(jnp.uint8)
    # reorder mode symbols into coded block order for the bitstream
    from h264lab_tpu.ops.tables import BLOCK_SCAN_4x4
    scan = jnp.asarray(BLOCK_SCAN_4x4)
    return dict(levels=levels, recon=recon, modes=modes,
                mode_sym_val=sym_val[:, scan], mode_sym_len=sym_len[:, scan],
                cost=cost)
