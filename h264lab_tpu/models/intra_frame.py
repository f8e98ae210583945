"""All-intra (I/IDR) frame pipeline: wavefront Intra_16x16 + chroma
encoding, batched TQ and CAVLC symbolization, in one jit-compiled scan.

Structure (TPU-first re-design of `mb_encode`/`mb_write`,
`src/h264-lab.h:5724-5812` / `:4378-4715`):

1. `lax.scan` over wavefront diagonals; each step processes every MB on
   the diagonal at once: gather recon edges (carry), predict V/H/DC,
   masked-SAD mode select, transform+quant+dequant+reconstruct, scatter
   edges and coefficient levels.
2. Post-scan (still on device, fully parallel): nnz grids, CAVLC nC
   contexts, CAVLC symbol expansion for every residual block, per-MB
   header symbols (mb_type, chroma mode, dQP).
3. Host: concatenate symbol slots in syntax order and pack bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from h264lab_tpu.ops import cavlc, intra, transform
from h264lab_tpu.ops import tables
from h264lab_tpu.models import wavefront

_ZZ = jnp.asarray(tables.ZIGZAG_4x4)            # scan pos -> raster idx
_BLOCK_SCAN = tables.BLOCK_SCAN_4x4             # coded order of luma blocks

INTRA_DEADZONE_Q8 = 85   # ~1/3, the JM intra deadzone


def mb_to_blocks(mb: jnp.ndarray, nblk: int) -> jnp.ndarray:
    """(k, n*4, n*4) -> (k, n, n, 4, 4) raster block split."""
    k = mb.shape[0]
    return mb.reshape(k, nblk, 4, nblk, 4).transpose(0, 1, 3, 2, 4)


def blocks_to_mb(blocks: jnp.ndarray) -> jnp.ndarray:
    k, n, _, _, _ = blocks.shape
    return blocks.transpose(0, 1, 3, 2, 4).reshape(k, n * 4, n * 4)


def _encode_luma_i16(src, pred, qp):
    """Intra_16x16 luma TQ path. src/pred (k,16,16) uint8.

    Returns (dc_levels (k,4,4), ac_levels (k,4,4,4,4), recon (k,16,16)).
    """
    sb = mb_to_blocks(src.astype(jnp.int32), 4)
    pb = mb_to_blocks(pred.astype(jnp.int32), 4)
    coef = transform.fdct4x4(sb - pb)
    dc = coef[..., 0, 0]                                    # (k, 4, 4)
    dc_lev = transform.quant_luma_dc(dc, qp)
    dc_deq = transform.dequant_luma_dc(dc_lev, qp)
    ac_lev = transform.quant4x4(coef, qp, INTRA_DEADZONE_Q8)
    ac_lev = ac_lev.at[..., 0, 0].set(0)
    deq = transform.dequant4x4(ac_lev, qp)
    deq = deq.at[..., 0, 0].set(dc_deq)
    res = transform.idct4x4(deq)
    recon = jnp.clip(res + pb, 0, 255).astype(jnp.uint8)
    return dc_lev, ac_lev, blocks_to_mb(recon)


def _encode_chroma(src, pred, qpc):
    """Chroma 8x8 TQ path for one plane. Returns (dc_levels (k,2,2),
    ac_levels (k,2,2,4,4), recon (k,8,8))."""
    sb = mb_to_blocks(src.astype(jnp.int32), 2)
    pb = mb_to_blocks(pred.astype(jnp.int32), 2)
    coef = transform.fdct4x4(sb - pb)
    dc = coef[..., 0, 0]                                    # (k, 2, 2)
    dc_lev = transform.quant_chroma_dc(dc, qpc)
    dc_deq = transform.dequant_chroma_dc(dc_lev, qpc)
    ac_lev = transform.quant4x4(coef, qpc, INTRA_DEADZONE_Q8)
    ac_lev = ac_lev.at[..., 0, 0].set(0)
    deq = transform.dequant4x4(ac_lev, qpc)
    deq = deq.at[..., 0, 0].set(dc_deq)
    res = transform.idct4x4(deq)
    recon = jnp.clip(res + pb, 0, 255).astype(jnp.uint8)
    return dc_lev, ac_lev, blocks_to_mb(recon)


def encode_intra_core(src_y_mb, src_u_mb, src_v_mb, qp, qpc,
                      steps, avail_top, avail_left,
                      mb_width: int, mb_height: int):
    """Run the wavefront intra scan + CAVLC symbolization for one frame
    (un-jitted core; vmap-able over leading batch axes for GOP/band
    parallelism — see h264lab_tpu.parallel).

    Args:
      src_*_mb: (nmb, 16, 16) / (nmb, 8, 8) uint8 source tiles.
      qp, qpc: int32 scalars.
      steps: (n_steps, kmax) int32 diagonal plan (-1 padded).
      avail_top/avail_left: (nmb,) bool neighbour availability (slice-aware).

    Returns a dict of per-MB arrays (modes, levels, recon, CAVLC symbols).
    """
    nmb = mb_width * mb_height

    def step(carry, idx):
        (bot_y, right_y, bot_u, right_u, bot_v, right_v,
         mode16, cmode, dc_lev_o, ac_lev_o, cdc_lev_o, cac_lev_o,
         recon_y_o, recon_u_o, recon_v_o) = carry

        mask = idx >= 0
        cidx = jnp.maximum(idx, 0)
        widx = jnp.where(mask, cidx, nmb)       # OOB -> dropped scatter

        a_top = avail_top[cidx]
        a_left = avail_left[cidx]
        tidx = jnp.maximum(cidx - mb_width, 0)
        lidx = jnp.maximum(cidx - 1, 0)

        src_y = src_y_mb[cidx]
        src_u = src_u_mb[cidx]
        src_v = src_v_mb[cidx]

        # ---- luma ----
        preds, valid = intra.predict_16x16(
            bot_y[tidx], right_y[lidx], a_top, a_left)
        m16, pred_y, _ = intra.select_mode(src_y, preds, valid)
        dc_lev, ac_lev, rec_y = _encode_luma_i16(src_y, pred_y, qp)

        # ---- chroma (joint mode for U and V) ----
        preds_u, valid_c = intra.predict_chroma(
            bot_u[tidx], right_u[lidx], a_top, a_left)
        preds_v, _ = intra.predict_chroma(
            bot_v[tidx], right_v[lidx], a_top, a_left)
        cost = (intra.sad(src_u[:, None], preds_u)
                + intra.sad(src_v[:, None], preds_v))
        cost = jnp.where(valid_c, cost, jnp.int32(1 << 30))
        cm = jnp.argmin(cost, axis=1).astype(jnp.int32)
        pred_u = jnp.take_along_axis(preds_u, cm[:, None, None, None], axis=1)[:, 0]
        pred_v = jnp.take_along_axis(preds_v, cm[:, None, None, None], axis=1)[:, 0]
        cdc_u, cac_u, rec_u = _encode_chroma(src_u, pred_u, qpc)
        cdc_v, cac_v, rec_v = _encode_chroma(src_v, pred_v, qpc)

        # ---- scatter carry + outputs ----
        carry = (
            bot_y.at[widx].set(rec_y[:, -1, :], mode="drop"),
            right_y.at[widx].set(rec_y[:, :, -1], mode="drop"),
            bot_u.at[widx].set(rec_u[:, -1, :], mode="drop"),
            right_u.at[widx].set(rec_u[:, :, -1], mode="drop"),
            bot_v.at[widx].set(rec_v[:, -1, :], mode="drop"),
            right_v.at[widx].set(rec_v[:, :, -1], mode="drop"),
            mode16.at[widx].set(m16, mode="drop"),
            cmode.at[widx].set(cm, mode="drop"),
            dc_lev_o.at[widx].set(dc_lev, mode="drop"),
            ac_lev_o.at[widx].set(ac_lev, mode="drop"),
            cdc_lev_o.at[widx].set(jnp.stack([cdc_u, cdc_v], 1), mode="drop"),
            cac_lev_o.at[widx].set(jnp.stack([cac_u, cac_v], 1), mode="drop"),
            recon_y_o.at[widx].set(rec_y, mode="drop"),
            recon_u_o.at[widx].set(rec_u, mode="drop"),
            recon_v_o.at[widx].set(rec_v, mode="drop"),
        )
        return carry, None

    init = (
        jnp.zeros((nmb, 16), jnp.uint8), jnp.zeros((nmb, 16), jnp.uint8),
        jnp.zeros((nmb, 8), jnp.uint8), jnp.zeros((nmb, 8), jnp.uint8),
        jnp.zeros((nmb, 8), jnp.uint8), jnp.zeros((nmb, 8), jnp.uint8),
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
    (_, _, _, _, _, _, mode16, cmode, dc_lev, ac_lev, cdc_lev, cac_lev,
     recon_y, recon_u, recon_v) = carry

    out = cavlc_symbolize_intra(
        mode16, cmode, dc_lev, ac_lev, cdc_lev, cac_lev,
        mb_width, mb_height)
    out.update(dict(mode16=mode16, cmode=cmode,
                    recon_y=recon_y, recon_u=recon_u, recon_v=recon_v))
    return out


encode_intra_frame = jax.jit(
    encode_intra_core, static_argnames=("mb_width", "mb_height"))


def _block_nc(nnz_grid, gw, gh, blk_avail_left, blk_avail_top):
    """nC context per block from an (gh, gw) nnz grid (spec 9.2.1)."""
    na = jnp.pad(nnz_grid, ((0, 0), (1, 0)))[:, :gw]
    nb = jnp.pad(nnz_grid, ((1, 0), (0, 0)))[:gh, :]
    both = blk_avail_left & blk_avail_top
    nc = jnp.where(both, (na + nb + 1) >> 1,
                   jnp.where(blk_avail_left, na,
                             jnp.where(blk_avail_top, nb, 0)))
    return nc


def cavlc_symbolize_intra(mode16, cmode, dc_lev, ac_lev, cdc_lev, cac_lev,
                          mb_width: int, mb_height: int):
    """Device-side CAVLC symbol computation for an all-I16 frame."""
    nmb = mb_width * mb_height

    # ---- nnz and cbp ----
    ac_nnz = jnp.sum(ac_lev != 0, axis=(-2, -1))            # (nmb, 4, 4)
    cac_nnz = jnp.sum(cac_lev != 0, axis=(-2, -1))          # (nmb, 2, 2, 2)
    cdc_nnz = jnp.sum(cdc_lev != 0, axis=(-2, -1))          # (nmb, 2)

    cbpl = (jnp.sum(ac_nnz, axis=(1, 2)) > 0)
    any_cac = jnp.sum(cac_nnz, axis=(1, 2, 3)) > 0
    any_cdc = jnp.sum(cdc_nnz, axis=1) > 0
    cbpc = jnp.where(any_cac, 2, jnp.where(any_cdc, 1, 0)).astype(jnp.int32)

    # coded nnz: AC counts only when the blocks are actually coded
    luma_nnz_coded = jnp.where(cbpl[:, None, None], ac_nnz, 0)
    cac_nnz_coded = jnp.where((cbpc == 2)[:, None, None, None], cac_nnz, 0)

    # ---- nC contexts ----
    gw, gh = 4 * mb_width, 4 * mb_height
    # (nmb, 4, 4) -> (gh, gw)
    lgrid = (luma_nnz_coded.reshape(mb_height, mb_width, 4, 4)
             .transpose(0, 2, 1, 3).reshape(gh, gw))
    bx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    by = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    nc_luma_grid = _block_nc(lgrid, gw, gh, bx > 0, by > 0)
    nc_luma = (nc_luma_grid.reshape(mb_height, 4, mb_width, 4)
               .transpose(0, 2, 1, 3).reshape(nmb, 4, 4))

    cgw, cgh = 2 * mb_width, 2 * mb_height
    cbx = jax.lax.broadcasted_iota(jnp.int32, (cgh, cgw), 1)
    cby = jax.lax.broadcasted_iota(jnp.int32, (cgh, cgw), 0)
    nc_chroma = []
    for p in range(2):
        cgrid = (cac_nnz_coded[:, p].reshape(mb_height, mb_width, 2, 2)
                 .transpose(0, 2, 1, 3).reshape(cgh, cgw))
        ncg = _block_nc(cgrid, cgw, cgh, cbx > 0, cby > 0)
        nc_chroma.append(ncg.reshape(mb_height, 2, mb_width, 2)
                         .transpose(0, 2, 1, 3).reshape(nmb, 2, 2))
    nc_chroma = jnp.stack(nc_chroma, axis=1)                # (nmb, 2, 2, 2)

    # ---- CAVLC blocks ----
    zz = _ZZ
    # luma DC: 16 coeffs, nC of block (0,0)
    dc_scan = dc_lev.reshape(nmb, 16)[:, zz]
    dc_vals, dc_lens, _ = cavlc.encode_blocks(
        dc_scan, nc_luma[:, 0, 0], 16)

    # luma AC: 15 coeffs per block
    ac_flat = ac_lev.reshape(nmb * 16, 16)
    ac_scan = ac_flat[:, zz][:, 1:]
    ac_scan = jnp.pad(ac_scan, ((0, 0), (0, 1)))
    ac_vals, ac_lens, _ = cavlc.encode_blocks(
        ac_scan, nc_luma.reshape(nmb * 16), 15)
    ac_vals = ac_vals.reshape(nmb, 16, cavlc.N_SLOTS)
    ac_lens = ac_lens.reshape(nmb, 16, cavlc.N_SLOTS)
    ac_lens = jnp.where(cbpl[:, None, None], ac_lens, 0)

    # chroma DC: 4 coeffs, raster scan, nC = -1
    cdc_scan = cdc_lev.reshape(nmb * 2, 4)
    cdc_scan = jnp.pad(cdc_scan, ((0, 0), (0, 12)))
    cdc_vals, cdc_lens, _ = cavlc.encode_blocks(
        cdc_scan, jnp.full((nmb * 2,), -1, jnp.int32), 4)
    cdc_vals = cdc_vals.reshape(nmb, 2, cavlc.N_SLOTS)
    cdc_lens = cdc_lens.reshape(nmb, 2, cavlc.N_SLOTS)
    cdc_lens = jnp.where((cbpc >= 1)[:, None, None], cdc_lens, 0)

    # chroma AC: 15 coeffs
    cac_flat = cac_lev.reshape(nmb * 8, 16)
    cac_scan = cac_flat[:, zz][:, 1:]
    cac_scan = jnp.pad(cac_scan, ((0, 0), (0, 1)))
    cac_vals, cac_lens, _ = cavlc.encode_blocks(
        cac_scan, nc_chroma.reshape(nmb * 8), 15)
    cac_vals = cac_vals.reshape(nmb, 8, cavlc.N_SLOTS)
    cac_lens = cac_lens.reshape(nmb, 8, cavlc.N_SLOTS)
    cac_lens = jnp.where((cbpc == 2)[:, None, None], cac_lens, 0)

    # ---- header symbols: mb_type, intra_chroma_pred_mode, mb_qp_delta ----
    mb_type = 1 + mode16 + 4 * cbpc + 12 * cbpl.astype(jnp.int32)
    mt_code = mb_type + 1
    mt_len = 2 * _bitlen32(mt_code) - 1
    cm_code = cmode + 1
    cm_len = 2 * _bitlen32(cm_code) - 1
    dqp_code = jnp.ones((nmb,), jnp.int32)   # se(0) -> ue(0) -> "1"
    dqp_len = jnp.ones((nmb,), jnp.int32)
    hdr_vals = jnp.stack([mt_code, cm_code, dqp_code], axis=1)
    hdr_lens = jnp.stack([mt_len, cm_len, dqp_len], axis=1)

    # ---- device-side syntax-order assembly (per MB: header | DC | AC in
    # coded block scan order | chroma DC | chroma AC) ----
    ns = cavlc.N_SLOTS
    scan_idx = jnp.asarray(_BLOCK_SCAN)
    sym_vals = jnp.concatenate([
        hdr_vals.astype(jnp.uint32),
        dc_vals,
        ac_vals[:, scan_idx].reshape(nmb, 16 * ns),
        cdc_vals.reshape(nmb, 2 * ns),
        cac_vals.reshape(nmb, 8 * ns),
    ], axis=1).ravel()
    sym_lens = jnp.concatenate([
        hdr_lens,
        dc_lens,
        ac_lens[:, scan_idx].reshape(nmb, 16 * ns),
        cdc_lens.reshape(nmb, 2 * ns),
        cac_lens.reshape(nmb, 8 * ns),
    ], axis=1).ravel()

    return dict(
        hdr_vals=hdr_vals.astype(jnp.uint32), hdr_lens=hdr_lens,
        dc_vals=dc_vals, dc_lens=dc_lens,
        ac_vals=ac_vals, ac_lens=ac_lens,
        cdc_vals=cdc_vals, cdc_lens=cdc_lens,
        cac_vals=cac_vals, cac_lens=cac_lens,
        cbpl=cbpl, cbpc=cbpc,
        sym_vals=sym_vals, sym_lens=sym_lens,
        total_bits=jnp.sum(sym_lens).astype(jnp.int32),
    )


def _bitlen32(x: jnp.ndarray) -> jnp.ndarray:
    """Bit length of positive int32 values."""
    return 32 - jax.lax.clz(x.astype(jnp.int32))


def assemble_intra_slice_symbols(out: dict) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate per-MB symbols in syntax order (host side).

    Order per MB: header(3) | luma DC(34) | 16 luma AC blocks in coded
    block scan order | chroma DC U,V | chroma AC U0..3 V0..3.
    Returns flat (vals, lens) arrays ready for BitWriter.append_symbols.
    """
    hdr_vals = np.asarray(out["hdr_vals"])
    hdr_lens = np.asarray(out["hdr_lens"])
    dc_vals = np.asarray(out["dc_vals"])
    dc_lens = np.asarray(out["dc_lens"])
    ac_vals = np.asarray(out["ac_vals"])[:, _BLOCK_SCAN]
    ac_lens = np.asarray(out["ac_lens"])[:, _BLOCK_SCAN]
    cdc_vals = np.asarray(out["cdc_vals"])
    cdc_lens = np.asarray(out["cdc_lens"])
    cac_vals = np.asarray(out["cac_vals"])
    cac_lens = np.asarray(out["cac_lens"])

    nmb = hdr_vals.shape[0]
    ns = dc_vals.shape[-1]
    vals = np.concatenate([
        hdr_vals,
        dc_vals,
        ac_vals.reshape(nmb, 16 * ns),
        cdc_vals.reshape(nmb, 2 * ns),
        cac_vals.reshape(nmb, 8 * ns),
    ], axis=1)
    lens = np.concatenate([
        hdr_lens,
        dc_lens,
        ac_lens.reshape(nmb, 16 * ns),
        cdc_lens.reshape(nmb, 2 * ns),
        cac_lens.reshape(nmb, 8 * ns),
    ], axis=1)
    return vals.ravel(), lens.ravel()
