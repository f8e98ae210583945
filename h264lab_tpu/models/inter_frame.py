"""P-frame pipeline: motion estimation, inter/intra decision, TQ, MVD and
skip derivation, CAVLC — batched over macroblocks.

TPU-first structure (re-design of the reference's per-MB
`inter_choose_mode` + `mb_write` path, `src/h264-lab.h:5283-5524`,
`:4378-4715`):

1. Pre-scan (fully parallel over MBs): 3-stage ME funnel (ops/me.py),
   motion-compensated prediction via precomputed half-pel planes, and the
   complete inter TQ/recon — no inter dependencies exist between MBs.
2. Wavefront scan: only the intra path needs reconstructed neighbour
   edges, so the scan chooses inter vs intra per MB and scatters recon
   edges; inter results are consumed from the pre-scan arrays.
3. Post-scan (fully parallel): exact median MV predictors and P_Skip
   derivation from final neighbour MVs (the reference resolves these
   sequentially in the raster loop; with all final MVs available they
   vectorize), coded-block patterns, CAVLC with skip-gated nnz contexts,
   and the device-side syntax-order symbol assembly incl. mb_skip_run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from h264lab_tpu.ops import bitpack, cavlc, intra, me, qpel, tables, transform
from h264lab_tpu.models import intra_frame
from h264lab_tpu.models.intra_frame import (
    mb_to_blocks, blocks_to_mb, _encode_luma_i16, _encode_chroma,
    _bitlen32, INTRA_DEADZONE_Q8)

INTER_DEADZONE_Q8 = 43   # ~1/6, the JM inter deadzone
INTRA_IN_P_PENALTY_BITS = 24

_ZZ = jnp.asarray(tables.ZIGZAG_4x4)
_BLOCK_SCAN = jnp.asarray(tables.BLOCK_SCAN_4x4)
_CBP_INTER_CODE = jnp.asarray(tables.CBP_TO_CODENUM[:, 1])


def _ue_codes(v):
    """Vectorized ue(v): returns (code_value, nbits)."""
    code = v + 1
    nb = _bitlen32(code)
    return code.astype(jnp.uint32), (2 * nb - 1).astype(jnp.int32)


def _se_codes(v):
    return _ue_codes(jnp.where(v > 0, 2 * v - 1, -2 * v))


def _encode_inter_luma(src, pred, qp):
    """Plain 4x4 TQ for inter luma (DC in-band). Returns (levels
    (k,4,4,4,4), recon (k,16,16))."""
    sb = mb_to_blocks(src.astype(jnp.int32), 4)
    pb = mb_to_blocks(pred.astype(jnp.int32), 4)
    coef = transform.fdct4x4(sb - pb)
    lev = transform.quant4x4(coef, qp, INTER_DEADZONE_Q8)
    deq = transform.dequant4x4(lev, qp)
    res = transform.idct4x4(deq)
    recon = jnp.clip(res + pb, 0, 255).astype(jnp.uint8)
    return lev, blocks_to_mb(recon)


def encode_p_core(src_y_mb, src_u_mb, src_v_mb,
                  ref_y_pad, ref_u_pad, ref_v_pad,
                  hpel_b, hpel_h, hpel_j, ref4_pad,
                  qp, qpc, steps, avail_top, avail_left,
                  mb_width: int, mb_height: int):
    nmb = mb_width * mb_height
    r = jnp.arange(nmb, dtype=jnp.int32) // mb_width
    c = jnp.arange(nmb, dtype=jnp.int32) % mb_width

    # ---------------- stage 1: ME + MC + inter TQ (parallel) -------------
    base_y = qpel.GUARD + 16 * r
    base_x = qpel.GUARD + 16 * c
    g4 = qpel.GUARD // 4
    base_y4 = g4 + 4 * r
    base_x4 = g4 + 4 * c
    # downsample each 16x16 tile independently to a 4x4 coarse tile
    t = src_y_mb.astype(jnp.int32).reshape(nmb, 4, 4, 4, 4)
    cur4 = ((t.sum(axis=(2, 4)) + 8) >> 4).astype(jnp.uint8)

    mv_y, mv_x, inter_cost = me.motion_search(
        src_y_mb, ref_y_pad, (hpel_b, hpel_h, hpel_j),
        base_y, base_x, base_y4, base_x4, cur4, ref4_pad, qp)

    pred_y_inter = qpel.mc_luma(ref_y_pad, hpel_b, hpel_h, hpel_j,
                                mv_y, mv_x, base_y, base_x)
    cb_y = qpel.GUARD // 2 + 8 * r
    cb_x = qpel.GUARD // 2 + 8 * c
    pred_u_inter = qpel.mc_chroma(ref_u_pad, mv_y, mv_x, cb_y, cb_x)
    pred_v_inter = qpel.mc_chroma(ref_v_pad, mv_y, mv_x, cb_y, cb_x)

    lev_inter, recon_y_inter = _encode_inter_luma(src_y_mb, pred_y_inter, qp)
    cdc_u_i, cac_u_i, recon_u_inter = _encode_chroma(
        src_u_mb, pred_u_inter, qpc)
    cdc_v_i, cac_v_i, recon_v_inter = _encode_chroma(
        src_v_mb, pred_v_inter, qpc)
    # NOTE: _encode_chroma uses the intra deadzone; acceptable tuning delta.

    # ---------------- stage 2: wavefront inter/intra decision ------------
    lam = me.lambda_me(qp)

    def step(carry, idx):
        (bot_y, right_y, bot_u, right_u, bot_v, right_v,
         is_intra_o, mode16, cmode, dc_lev_o, ac_lev_o, cdc_lev_o,
         cac_lev_o, recon_y_o, recon_u_o, recon_v_o) = carry

        mask = idx >= 0
        cidx = jnp.maximum(idx, 0)
        widx = jnp.where(mask, cidx, nmb)
        a_top = avail_top[cidx]
        a_left = avail_left[cidx]
        tidx = jnp.maximum(cidx - mb_width, 0)
        lidx = jnp.maximum(cidx - 1, 0)

        src_y = src_y_mb[cidx]
        src_u = src_u_mb[cidx]
        src_v = src_v_mb[cidx]

        preds, valid = intra.predict_16x16(
            bot_y[tidx], right_y[lidx], a_top, a_left)
        m16, pred_y_i, icost = intra.select_mode(src_y, preds, valid)
        use_intra = (icost + lam * INTRA_IN_P_PENALTY_BITS
                     < inter_cost[cidx])

        dc_lev, ac_lev, rec_y_intra = _encode_luma_i16(src_y, pred_y_i, qp)

        preds_u, valid_c = intra.predict_chroma(
            bot_u[tidx], right_u[lidx], a_top, a_left)
        preds_v, _ = intra.predict_chroma(
            bot_v[tidx], right_v[lidx], a_top, a_left)
        ccost = (intra.sad(src_u[:, None], preds_u)
                 + intra.sad(src_v[:, None], preds_v))
        ccost = jnp.where(valid_c, ccost, jnp.int32(1 << 30))
        cm = jnp.argmin(ccost, axis=1).astype(jnp.int32)
        pred_u_i = jnp.take_along_axis(preds_u, cm[:, None, None, None],
                                       axis=1)[:, 0]
        pred_v_i = jnp.take_along_axis(preds_v, cm[:, None, None, None],
                                       axis=1)[:, 0]
        cdc_u, cac_u, rec_u_intra = _encode_chroma(src_u, pred_u_i, qpc)
        cdc_v, cac_v, rec_v_intra = _encode_chroma(src_v, pred_v_i, qpc)

        sel = use_intra[:, None, None]
        rec_y = jnp.where(sel, rec_y_intra, recon_y_inter[cidx])
        rec_u = jnp.where(sel, rec_u_intra, recon_u_inter[cidx])
        rec_v = jnp.where(sel, rec_v_intra, recon_v_inter[cidx])
        cdc_sel = jnp.where(use_intra[:, None, None, None],
                            jnp.stack([cdc_u, cdc_v], 1),
                            jnp.stack([cdc_u_i[cidx], cdc_v_i[cidx]], 1))
        cac_sel = jnp.where(use_intra[:, None, None, None, None, None],
                            jnp.stack([cac_u, cac_v], 1),
                            jnp.stack([cac_u_i[cidx], cac_v_i[cidx]], 1))

        carry = (
            bot_y.at[widx].set(rec_y[:, -1, :], mode="drop"),
            right_y.at[widx].set(rec_y[:, :, -1], mode="drop"),
            bot_u.at[widx].set(rec_u[:, -1, :], mode="drop"),
            right_u.at[widx].set(rec_u[:, :, -1], mode="drop"),
            bot_v.at[widx].set(rec_v[:, -1, :], mode="drop"),
            right_v.at[widx].set(rec_v[:, :, -1], mode="drop"),
            is_intra_o.at[widx].set(use_intra, mode="drop"),
            mode16.at[widx].set(m16, mode="drop"),
            cmode.at[widx].set(cm, mode="drop"),
            dc_lev_o.at[widx].set(dc_lev, mode="drop"),
            ac_lev_o.at[widx].set(ac_lev, mode="drop"),
            cdc_lev_o.at[widx].set(cdc_sel, mode="drop"),
            cac_lev_o.at[widx].set(cac_sel, mode="drop"),
            recon_y_o.at[widx].set(rec_y, mode="drop"),
            recon_u_o.at[widx].set(rec_u, mode="drop"),
            recon_v_o.at[widx].set(rec_v, mode="drop"),
        )
        return carry, None

    init = (
        jnp.zeros((nmb, 16), jnp.uint8), jnp.zeros((nmb, 16), jnp.uint8),
        jnp.zeros((nmb, 8), jnp.uint8), jnp.zeros((nmb, 8), jnp.uint8),
        jnp.zeros((nmb, 8), jnp.uint8), jnp.zeros((nmb, 8), jnp.uint8),
        jnp.zeros((nmb,), bool),
        jnp.zeros((nmb,), jnp.int32), jnp.zeros((nmb,), jnp.int32),
        jnp.zeros((nmb, 4, 4), jnp.int32),
        jnp.zeros((nmb, 4, 4, 4, 4), jnp.int32),
        jnp.zeros((nmb, 2, 2, 2), jnp.int32),
        jnp.zeros((nmb, 2, 2, 2, 4, 4), jnp.int32),
        jnp.zeros((nmb, 16, 16), jnp.uint8),
        jnp.zeros((nmb, 8, 8), jnp.uint8),
        jnp.zeros((nmb, 8, 8), jnp.uint8),
    )
    carry, _ = jax.lax.scan(step, init, steps)
    (_, _, _, _, _, _, is_intra, mode16, cmode, dc_lev, ac_lev_intra,
     cdc_lev, cac_lev, recon_y, recon_u, recon_v) = carry

    # ---------------- stage 3: MVs, skip, CBP, CAVLC ---------------------
    mv_y = jnp.where(is_intra, 0, mv_y)
    mv_x = jnp.where(is_intra, 0, mv_x)

    out = _symbolize_p(
        is_intra, mode16, cmode, mv_y, mv_x,
        dc_lev, ac_lev_intra, lev_inter, cdc_lev, cac_lev,
        mb_width, mb_height)
    out.update(dict(
        recon_y=recon_y, recon_u=recon_u, recon_v=recon_v,
        mv_y=mv_y, mv_x=mv_x, is_intra=is_intra))
    return out


def _neighbor_gather(arr2d, dy, dx, fill):
    """Shift a (mbh, mbw) array so position (r, c) reads (r-dy, c-dx);
    out-of-frame reads become `fill`. Returns (shifted, valid_mask)."""
    a = jnp.roll(arr2d, (dy, dx), axis=(0, 1))
    mbh, mbw = arr2d.shape[0], arr2d.shape[1]
    rr = jax.lax.broadcasted_iota(jnp.int32, (mbh, mbw), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (mbh, mbw), 1)
    ok = ((rr - dy) >= 0) & ((rr - dy) < mbh) & \
         ((cc - dx) >= 0) & ((cc - dx) < mbw)
    return jnp.where(ok, a, fill), ok


def _median3(a, b, c):
    return jnp.maximum(jnp.minimum(jnp.maximum(a, b), c),
                       jnp.minimum(a, b))


def _mv_predictors(mv_y, mv_x, is_intra, mb_width, mb_height):
    """Spec 8.4.1.3 median predictor + 8.4.1.1 P_Skip predictor, for
    16x16 partitions with a single reference. All (nmb,) vectors."""
    mbh, mbw = mb_height, mb_width
    my = mv_y.reshape(mbh, mbw)
    mx = mv_x.reshape(mbh, mbw)
    intra2d = is_intra.reshape(mbh, mbw)

    def nb(dy, dx):
        """Neighbour (mv_y, mv_x, ref0_flag, mb_avail) shifted grids."""
        sy, _ = _neighbor_gather(my, dy, dx, 0)
        sx, _ = _neighbor_gather(mx, dy, dx, 0)
        ii, _ = _neighbor_gather(intra2d, dy, dx, True)
        rr = jax.lax.broadcasted_iota(jnp.int32, (mbh, mbw), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (mbh, mbw), 1)
        avail = ((rr - dy) >= 0) & ((rr - dy) < mbh) & \
                ((cc - dx) >= 0) & ((cc - dx) < mbw)
        ref0 = avail & ~ii
        sy = jnp.where(ref0, sy, 0)
        sx = jnp.where(ref0, sx, 0)
        return sy, sx, ref0, avail

    ay, ax, aref, aav = nb(0, 1)      # A: left
    by, bx, bref, bav = nb(1, 0)      # B: top
    cy_, cx_, cref, cav = nb(1, -1)   # C: top-right
    dy_, dx_, dref, dav = nb(1, 1)    # D: top-left
    # C unavailable -> substitute D (spec 8.4.1.3.2)
    cy_ = jnp.where(cav, cy_, dy_)
    cx_ = jnp.where(cav, cx_, dx_)
    cref = jnp.where(cav, cref, dref)
    cav2 = cav | dav

    # B,C both unavailable and A available -> B,C take A's values
    subst = (~bav) & (~cav2) & aav
    by = jnp.where(subst, ay, by)
    bx = jnp.where(subst, ax, bx)
    bref = jnp.where(subst, aref, bref)
    cy_ = jnp.where(subst, ay, cy_)
    cx_ = jnp.where(subst, ax, cx_)
    cref = jnp.where(subst, aref, cref)

    cnt = aref.astype(jnp.int32) + bref.astype(jnp.int32) + cref.astype(jnp.int32)
    only_a = (cnt == 1) & aref
    only_b = (cnt == 1) & bref
    only_c = (cnt == 1) & cref
    med_y = _median3(ay, by, cy_)
    med_x = _median3(ax, bx, cx_)
    mvp_y = jnp.where(only_a, ay, jnp.where(only_b, by,
                      jnp.where(only_c, cy_, med_y)))
    mvp_x = jnp.where(only_a, ax, jnp.where(only_b, bx,
                      jnp.where(only_c, cx_, med_x)))

    # P_Skip predictor (spec 8.4.1.1)
    a_zero = aref & (ay == 0) & (ax == 0)
    b_zero = bref & (by == 0) & (bx == 0)
    force0 = (~aav) | (~bav) | a_zero | b_zero
    skip_y = jnp.where(force0, 0, mvp_y)
    skip_x = jnp.where(force0, 0, mvp_x)
    return (mvp_y.reshape(-1), mvp_x.reshape(-1),
            skip_y.reshape(-1), skip_x.reshape(-1))


def _symbolize_p(is_intra, mode16, cmode, mv_y, mv_x,
                 dc_lev, ac_lev_intra, lev_inter, cdc_lev, cac_lev,
                 mb_width: int, mb_height: int):
    nmb = mb_width * mb_height
    ns = cavlc.N_SLOTS

    # ---- nnz / cbp --------------------------------------------------------
    ac_nnz_intra = jnp.sum(ac_lev_intra != 0, axis=(-2, -1))   # (nmb,4,4)
    nnz_inter = jnp.sum(lev_inter != 0, axis=(-2, -1))         # (nmb,4,4)
    cdc_nnz = jnp.sum(cdc_lev != 0, axis=(-2, -1))             # (nmb,2)
    cac_nnz = jnp.sum(cac_lev != 0, axis=(-2, -1))             # (nmb,2,2,2)

    cbpl_intra = (jnp.sum(ac_nnz_intra, axis=(1, 2)) > 0)
    # inter cbp luma: bit g per 8x8 group
    grp = nnz_inter.reshape(nmb, 2, 2, 2, 2).transpose(0, 1, 3, 2, 4)
    grp_nz = jnp.sum(grp, axis=(3, 4)) > 0                      # (nmb,2,2)
    cbpl_inter = (grp_nz[:, 0, 0].astype(jnp.int32)
                  + 2 * grp_nz[:, 0, 1]
                  + 4 * grp_nz[:, 1, 0]
                  + 8 * grp_nz[:, 1, 1])
    any_cac = jnp.sum(cac_nnz, axis=(1, 2, 3)) > 0
    any_cdc = jnp.sum(cdc_nnz, axis=1) > 0
    cbpc = jnp.where(any_cac, 2, jnp.where(any_cdc, 1, 0)).astype(jnp.int32)
    cbp_inter = cbpl_inter + (cbpc << 4)

    # ---- predictors, skip -------------------------------------------------
    mvp_y, mvp_x, skip_y, skip_x = _mv_predictors(
        mv_y, mv_x, is_intra, mb_width, mb_height)
    mvd_y = mv_y - mvp_y
    mvd_x = mv_x - mvp_x
    skip = (~is_intra) & (cbp_inter == 0) & \
           (mv_y == skip_y) & (mv_x == skip_x)

    # ---- coded nnz for contexts ------------------------------------------
    luma_nnz = jnp.where(is_intra[:, None, None],
                         jnp.where(cbpl_intra[:, None, None],
                                   ac_nnz_intra, 0),
                         nnz_inter)
    luma_nnz = jnp.where(skip[:, None, None], 0, luma_nnz)
    cac_nnz_coded = jnp.where((cbpc == 2)[:, None, None, None], cac_nnz, 0)
    cac_nnz_coded = jnp.where(skip[:, None, None, None], 0, cac_nnz_coded)

    gw, gh = 4 * mb_width, 4 * mb_height
    lgrid = (luma_nnz.reshape(mb_height, mb_width, 4, 4)
             .transpose(0, 2, 1, 3).reshape(gh, gw))
    bxg = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    byg = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    nc_grid = intra_frame._block_nc(lgrid, gw, gh, bxg > 0, byg > 0)
    nc_luma = (nc_grid.reshape(mb_height, 4, mb_width, 4)
               .transpose(0, 2, 1, 3).reshape(nmb, 4, 4))

    cgw, cgh = 2 * mb_width, 2 * mb_height
    cbx = jax.lax.broadcasted_iota(jnp.int32, (cgh, cgw), 1)
    cby = jax.lax.broadcasted_iota(jnp.int32, (cgh, cgw), 0)
    nc_chroma = []
    for p in range(2):
        cgrid = (cac_nnz_coded[:, p].reshape(mb_height, mb_width, 2, 2)
                 .transpose(0, 2, 1, 3).reshape(cgh, cgw))
        ncg = intra_frame._block_nc(cgrid, cgw, cgh, cbx > 0, cby > 0)
        nc_chroma.append(ncg.reshape(mb_height, 2, mb_width, 2)
                         .transpose(0, 2, 1, 3).reshape(nmb, 2, 2))
    nc_chroma = jnp.stack(nc_chroma, axis=1)

    # ---- CAVLC blocks -----------------------------------------------------
    # intra luma DC
    dc_scan = dc_lev.reshape(nmb, 16)[:, _ZZ]
    dc_vals, dc_lens, _ = cavlc.encode_blocks(dc_scan, nc_luma[:, 0, 0], 16)
    dc_lens = jnp.where(is_intra[:, None], dc_lens, 0)

    # intra luma AC (15)
    aci = ac_lev_intra.reshape(nmb * 16, 16)[:, _ZZ][:, 1:]
    aci = jnp.pad(aci, ((0, 0), (0, 1)))
    vi, li, _ = cavlc.encode_blocks(aci, nc_luma.reshape(nmb * 16), 15)
    vi = vi.reshape(nmb, 16, ns)
    li = li.reshape(nmb, 16, ns)
    li = jnp.where((is_intra & cbpl_intra)[:, None, None], li, 0)

    # inter luma (16)
    acn = lev_inter.reshape(nmb * 16, 16)[:, _ZZ]
    vn, ln, _ = cavlc.encode_blocks(acn, nc_luma.reshape(nmb * 16), 16)
    vn = vn.reshape(nmb, 16, ns)
    ln = ln.reshape(nmb, 16, ns)
    # gate by 8x8 group cbp bit; group of block (bb,bc) = (bb//2)*2+(bc//2)
    bb = jnp.arange(16) // 4
    bc = jnp.arange(16) % 4
    grp_of_block = (bb // 2) * 2 + (bc // 2)                  # (16,)
    bit = (cbpl_inter[:, None] >> grp_of_block[None, :]) & 1
    ln = jnp.where((~is_intra & ~skip)[:, None, None] & (bit > 0)[:, :, None],
                   ln, 0)

    luma_vals = jnp.where(is_intra[:, None, None], vi, vn)
    luma_lens = jnp.where(is_intra[:, None, None], li, ln)

    # chroma DC
    cdc_scan = cdc_lev.reshape(nmb * 2, 4)
    cdc_scan = jnp.pad(cdc_scan, ((0, 0), (0, 12)))
    cdc_vals, cdc_lens, _ = cavlc.encode_blocks(
        cdc_scan, jnp.full((nmb * 2,), -1, jnp.int32), 4)
    cdc_vals = cdc_vals.reshape(nmb, 2, ns)
    cdc_lens = cdc_lens.reshape(nmb, 2, ns)
    cdc_lens = jnp.where(((cbpc >= 1) & ~skip)[:, None, None], cdc_lens, 0)

    # chroma AC
    cacf = cac_lev.reshape(nmb * 8, 16)[:, _ZZ][:, 1:]
    cacf = jnp.pad(cacf, ((0, 0), (0, 1)))
    cac_vals, cac_lens, _ = cavlc.encode_blocks(
        cacf, nc_chroma.reshape(nmb * 8), 15)
    cac_vals = cac_vals.reshape(nmb, 8, ns)
    cac_lens = cac_lens.reshape(nmb, 8, ns)
    cac_lens = jnp.where(((cbpc == 2) & ~skip)[:, None, None], cac_lens, 0)

    # ---- header symbols ---------------------------------------------------
    coded = ~skip
    skip_i = skip.astype(jnp.int32)
    s_cum = jnp.cumsum(skip_i)
    # skips immediately before each coded MB: S_excl[i] - last coded's S
    s_excl = s_cum - skip_i
    marker = jnp.where(coded, s_cum, -1)
    run_base = jax.lax.associative_scan(jnp.maximum, marker)
    run_base_prev = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                     run_base[:-1]])
    run_base_prev = jnp.maximum(run_base_prev, 0)
    skip_run = jnp.where(coded, s_excl - run_base_prev, 0)
    sr_v, sr_l = _ue_codes(jnp.maximum(skip_run, 0))
    sr_l = jnp.where(coded, sr_l, 0)
    trailing = s_cum[-1] - jnp.maximum(jnp.max(marker), 0)
    tr_v, tr_l = _ue_codes(jnp.maximum(trailing, 0))
    tr_l = jnp.where(trailing > 0, tr_l, 0)

    # mb_type: inter P_L0_16x16 -> ue(0); intra -> ue(5 + i16 code)
    i16code = 1 + mode16 + 4 * cbpc + 12 * cbpl_intra.astype(jnp.int32)
    mb_type_val = jnp.where(is_intra, 5 + i16code, 0)
    mt_v, mt_l = _ue_codes(mb_type_val)
    mt_l = jnp.where(coded, mt_l, 0)

    mvdx_v, mvdx_l = _se_codes(mvd_x)
    mvdy_v, mvdy_l = _se_codes(mvd_y)
    inter_coded = coded & ~is_intra
    mvdx_l = jnp.where(inter_coded, mvdx_l, 0)
    mvdy_l = jnp.where(inter_coded, mvdy_l, 0)

    cm_v, cm_l = _ue_codes(cmode)
    cm_l = jnp.where(coded & is_intra, cm_l, 0)

    cbp_code = _CBP_INTER_CODE[jnp.clip(cbp_inter, 0, 47)]
    cbp_v, cbp_l = _ue_codes(cbp_code)
    cbp_l = jnp.where(inter_coded, cbp_l, 0)

    # mb_qp_delta: intra16 always; inter iff cbp != 0
    dqp_needed = coded & (is_intra | (cbp_inter != 0))
    dqp_v = jnp.ones((nmb,), jnp.uint32)
    dqp_l = jnp.where(dqp_needed, 1, 0)

    hdr_vals = jnp.stack([sr_v, mt_v, mvdx_v, mvdy_v, cm_v,
                          cbp_v, dqp_v], axis=1)
    hdr_lens = jnp.stack([sr_l, mt_l, mvdx_l, mvdy_l, cm_l,
                          cbp_l, dqp_l], axis=1)

    # ---- assemble ---------------------------------------------------------
    sym_vals = jnp.concatenate([
        hdr_vals.astype(jnp.uint32),
        dc_vals,
        luma_vals[:, _BLOCK_SCAN].reshape(nmb, 16 * ns),
        cdc_vals.reshape(nmb, 2 * ns),
        cac_vals.reshape(nmb, 8 * ns),
    ], axis=1).ravel()
    sym_lens = jnp.concatenate([
        hdr_lens,
        dc_lens,
        luma_lens[:, _BLOCK_SCAN].reshape(nmb, 16 * ns),
        cdc_lens.reshape(nmb, 2 * ns),
        cac_lens.reshape(nmb, 8 * ns),
    ], axis=1).ravel()
    sym_vals = jnp.concatenate([sym_vals, tr_v[None]])
    sym_lens = jnp.concatenate([sym_lens, tr_l[None]])

    return dict(
        sym_vals=sym_vals, sym_lens=sym_lens,
        total_bits=jnp.sum(sym_lens).astype(jnp.int32),
        skip=skip, cbp_inter=cbp_inter, cbpc=cbpc,
        mvd_y=mvd_y, mvd_x=mvd_x,
    )


encode_p_frame = jax.jit(
    encode_p_core, static_argnames=("mb_width", "mb_height"))
