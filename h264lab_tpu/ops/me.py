"""Motion estimation, batched over macroblocks.

TPU-first re-design of the reference's candidate + small-diamond descent
(`me_search_diamond`, `src/h264-lab.h:4973-5176`): branchy sequential
descent maps poorly onto a vector machine, so ME here is a regular
3-stage funnel evaluated for every MB of the frame at once:

1. coarse: dense full search on 4x-downsampled tiles (±4 coarse px =
   ±16 full px), 81 candidates of 4x4-SAD each;
2. full-pel refine: dense ±2 window (25 candidates) of 16x16 SAD around
   the scaled coarse winner;
3. sub-pel refine: 8 half-pel then 8 quarter-pel neighbours via the
   precomputed half-pel planes (ops/qpel.py).

Every stage is a fixed-shape gather + reduction — no data-dependent
control flow. Costs are SAD + lambda_me * mv-bits, with the predictor
approximated by (0,0) during search (exact median predictors are applied
in the post-scan MVD pass; see models/inter_frame.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from h264lab_tpu.ops import qpel

COARSE_R = 4        # coarse search radius (in 4x-downsampled pixels)
REFINE_R = 2        # full-pel refinement radius
MAX_MV_PEL = COARSE_R * 4 + REFINE_R   # = 18 full-pel; GUARD must exceed +3


def mv_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Exp-Golomb bit count of se(v) (mv component in quarter-pel)."""
    code = jnp.where(v > 0, 2 * v - 1, -2 * v) + 1
    nb = 32 - jax.lax.clz(jnp.maximum(code, 1).astype(jnp.int32))
    return 2 * nb - 1


def lambda_me(qp: jnp.ndarray) -> jnp.ndarray:
    """sqrt of the JM mode lambda, in int (>=1)."""
    lam = 0.85 * 2.0 ** ((qp.astype(jnp.float32) - 12.0) / 3.0)
    return jnp.maximum(jnp.sqrt(lam), 1.0).astype(jnp.int32)


def downsample4(plane: jnp.ndarray) -> jnp.ndarray:
    """4x box downsample (uint8 -> uint8) for the coarse stage."""
    h, w = plane.shape
    x = plane[:h - h % 4, :w - w % 4].astype(jnp.int32)
    x = x.reshape(h // 4, 4, w // 4, 4).sum(axis=(1, 3))
    return ((x + 8) >> 4).astype(jnp.uint8)


def _window_offsets(radius: int):
    d = np.arange(-radius, radius + 1, dtype=np.int32)
    dy, dx = np.meshgrid(d, d, indexing="ij")
    return jnp.asarray(dy.ravel()), jnp.asarray(dx.ravel())


def coarse_search(cur4: jnp.ndarray, ref4_pad: jnp.ndarray,
                  base_y4: jnp.ndarray, base_x4: jnp.ndarray,
                  lam: jnp.ndarray):
    """Stage 1: (k, 4, 4) coarse tiles vs padded 4x-downsampled reference.

    Returns best (mv_y4, mv_x4) in coarse-pixel units.
    """
    dy, dx = _window_offsets(COARSE_R)          # (81,)
    n_cand = dy.shape[0]

    def cand_sad(i, best):
        best_cost, best_y, best_x = best
        blk = qpel.gather_blocks(ref4_pad, base_y4 + dy[i], base_x4 + dx[i],
                                 4, 4).astype(jnp.int32)
        sad = jnp.sum(jnp.abs(cur4.astype(jnp.int32) - blk), axis=(1, 2))
        cost = sad * 16 + lam * (mv_bits(dy[i] * 16) + mv_bits(dx[i] * 16))
        better = cost < best_cost
        return (jnp.where(better, cost, best_cost),
                jnp.where(better, dy[i], best_y),
                jnp.where(better, dx[i], best_x))

    k = cur4.shape[0]
    init = (jnp.full((k,), 1 << 30, jnp.int32),
            jnp.zeros((k,), jnp.int32), jnp.zeros((k,), jnp.int32))
    cost, my, mx = jax.lax.fori_loop(0, n_cand, cand_sad, init)
    return my, mx


def refine_search(cur: jnp.ndarray, ref_pad: jnp.ndarray,
                  base_y: jnp.ndarray, base_x: jnp.ndarray,
                  center_y: jnp.ndarray, center_x: jnp.ndarray,
                  lam: jnp.ndarray):
    """Stage 2: full-pel ±REFINE_R around (center_y, center_x) (full-pel).

    Returns (mv_y, mv_x) full-pel and the winning SAD cost.
    """
    dy, dx = _window_offsets(REFINE_R)

    def cand(i, best):
        best_cost, best_y, best_x = best
        yy = center_y + dy[i]
        xx = center_x + dx[i]
        blk = qpel.gather_blocks(ref_pad, base_y + yy, base_x + xx,
                                 16, 16).astype(jnp.int32)
        sad = jnp.sum(jnp.abs(cur.astype(jnp.int32) - blk), axis=(1, 2))
        cost = sad + lam * (mv_bits(yy * 4) + mv_bits(xx * 4))
        better = cost < best_cost
        return (jnp.where(better, cost, best_cost),
                jnp.where(better, yy, best_y),
                jnp.where(better, xx, best_x))

    k = cur.shape[0]
    init = (jnp.full((k,), 1 << 30, jnp.int32),
            jnp.zeros((k,), jnp.int32), jnp.zeros((k,), jnp.int32))
    cost, my, mx = jax.lax.fori_loop(0, dy.shape[0], cand, init)
    return my, mx, cost


_SUBPEL_OFFS = jnp.asarray(
    [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)],
    dtype=jnp.int32)


def subpel_refine(cur: jnp.ndarray, planes, base_y, base_x,
                  mv_y_q, mv_x_q, lam, step: int):
    """One sub-pel refinement round: test the 8 neighbours at `step`
    quarter-pel distance around (mv_y_q, mv_x_q). Returns improved MV."""
    full, b, h, j = planes
    cur_i = cur.astype(jnp.int32)

    def cand(i, best):
        best_cost, best_y, best_x = best
        yy = mv_y_q + _SUBPEL_OFFS[i, 0] * step
        xx = mv_x_q + _SUBPEL_OFFS[i, 1] * step
        pred = qpel.mc_luma(full, b, h, j, yy, xx, base_y, base_x)
        sad = jnp.sum(jnp.abs(cur_i - pred.astype(jnp.int32)), axis=(1, 2))
        cost = sad + lam * (mv_bits(yy) + mv_bits(xx))
        better = cost < best_cost
        return (jnp.where(better, cost, best_cost),
                jnp.where(better, yy, best_y),
                jnp.where(better, xx, best_x))

    # seed with the current position
    pred0 = qpel.mc_luma(full, b, h, j, mv_y_q, mv_x_q, base_y, base_x)
    sad0 = jnp.sum(jnp.abs(cur_i - pred0.astype(jnp.int32)), axis=(1, 2))
    cost0 = sad0 + lam * (mv_bits(mv_y_q) + mv_bits(mv_x_q))
    best = jax.lax.fori_loop(0, 8, cand, (cost0, mv_y_q, mv_x_q))
    return best  # (cost, mv_y_q, mv_x_q)


def motion_search(cur_mb, ref_pad, hpel, base_y, base_x, base_y4, base_x4,
                  cur4, ref4_pad, qp):
    """Full 3-stage ME for all MBs. Returns (mv_y, mv_x) in quarter-pel
    and the final cost (SAD + lambda*mvbits)."""
    lam = lambda_me(qp)
    cy4, cx4 = coarse_search(cur4, ref4_pad, base_y4, base_x4, lam)
    my, mx, _ = refine_search(cur_mb, ref_pad, base_y, base_x,
                              cy4 * 4, cx4 * 4, lam)
    b, h, j = hpel
    planes = (ref_pad, b, h, j)
    cost, qy, qx = subpel_refine(cur_mb, planes, base_y, base_x,
                                 my * 4, mx * 4, lam, step=2)
    cost, qy, qx = subpel_refine(cur_mb, planes, base_y, base_x,
                                 qy, qx, lam, step=1)
    return qy, qx, cost


# ---------------------------------------------------------------------------
# Partition motion search (16x8 / 8x16 / 8x8)
# ---------------------------------------------------------------------------

def subpel_refine_block(cur, planes, base_y, base_x, mv_y_q, mv_x_q, lam,
                        step: int, bh: int, bw: int):
    """Sub-pel refinement for arbitrary block shapes (partition ME).
    cur: (k, bh, bw). Returns (cost, mv_y_q, mv_x_q)."""
    full, b, h, j = planes
    cur_i = cur.astype(jnp.int32)

    def cand(i, best):
        best_cost, best_y, best_x = best
        yy = mv_y_q + _SUBPEL_OFFS[i, 0] * step
        xx = mv_x_q + _SUBPEL_OFFS[i, 1] * step
        pred = qpel.mc_luma(full, b, h, j, yy, xx, base_y, base_x, bh, bw)
        sad = jnp.sum(jnp.abs(cur_i - pred.astype(jnp.int32)), axis=(1, 2))
        cost = sad + lam * (mv_bits(yy) + mv_bits(xx))
        better = cost < best_cost
        return (jnp.where(better, cost, best_cost),
                jnp.where(better, yy, best_y),
                jnp.where(better, xx, best_x))

    pred0 = qpel.mc_luma(full, b, h, j, mv_y_q, mv_x_q, base_y, base_x,
                         bh, bw)
    sad0 = jnp.sum(jnp.abs(cur_i - pred0.astype(jnp.int32)), axis=(1, 2))
    cost0 = sad0 + lam * (mv_bits(mv_y_q) + mv_bits(mv_x_q))
    return jax.lax.fori_loop(0, 8, cand, (cost0, mv_y_q, mv_x_q))


def refine_block(cur, ref_pad, base_y, base_x, center_y, center_x, lam,
                 bh: int, bw: int):
    """Full-pel ±REFINE_R dense refinement for an arbitrary block shape."""
    dy, dx = _window_offsets(REFINE_R)

    def cand(i, best):
        best_cost, best_y, best_x = best
        yy = center_y + dy[i]
        xx = center_x + dx[i]
        blk = qpel.gather_blocks(ref_pad, base_y + yy, base_x + xx,
                                 bh, bw).astype(jnp.int32)
        sad = jnp.sum(jnp.abs(cur.astype(jnp.int32) - blk), axis=(1, 2))
        cost = sad + lam * (mv_bits(yy * 4) + mv_bits(xx * 4))
        better = cost < best_cost
        return (jnp.where(better, cost, best_cost),
                jnp.where(better, yy, best_y),
                jnp.where(better, xx, best_x))

    k = cur.shape[0]
    init = (jnp.full((k,), 1 << 30, jnp.int32),
            jnp.zeros((k,), jnp.int32), jnp.zeros((k,), jnp.int32))
    return jax.lax.fori_loop(0, dy.shape[0], cand, init)


def partition_search(cur_mb, ref_pad, hpel, base_y, base_x,
                     center_full_y, center_full_x, qp):
    """Motion search for all sub-partitions of every MB, seeded from the
    16x16 full-pel winner (center_full_*, full-pel units).

    Returns dict with per-shape quarter-pel MVs and costs:
      mv16x8 (k, 2, 2), mv8x16 (k, 2, 2), mv8x8 (k, 4, 2) [..., (y, x)]
      cost16x8/cost8x16/cost8x8: (k,) summed SAD+lambda*mvbits costs.
    """
    lam = lambda_me(qp)
    b, h, j = hpel
    planes = (ref_pad, b, h, j)

    def search_sub(oy, ox, bh, bw):
        cur = cur_mb[:, oy:oy + bh, ox:ox + bw]
        by = base_y + oy
        bx = base_x + ox
        c, my, mx = refine_block(cur, ref_pad, by, bx,
                                 center_full_y, center_full_x, lam, bh, bw)
        c, qy, qx = subpel_refine_block(cur, planes, by, bx, my * 4, mx * 4,
                                        lam, 2, bh, bw)
        c, qy, qx = subpel_refine_block(cur, planes, by, bx, qy, qx,
                                        lam, 1, bh, bw)
        return c, qy, qx

    out = {}
    # 16x8 (top, bottom)
    parts = [search_sub(0, 0, 8, 16), search_sub(8, 0, 8, 16)]
    out["mv16x8"] = jnp.stack(
        [jnp.stack([p[1], p[2]], axis=-1) for p in parts], axis=1)
    out["cost16x8"] = parts[0][0] + parts[1][0]
    # 8x16 (left, right)
    parts = [search_sub(0, 0, 16, 8), search_sub(0, 8, 16, 8)]
    out["mv8x16"] = jnp.stack(
        [jnp.stack([p[1], p[2]], axis=-1) for p in parts], axis=1)
    out["cost8x16"] = parts[0][0] + parts[1][0]
    # 8x8 (raster quadrants)
    parts = [search_sub(0, 0, 8, 8), search_sub(0, 8, 8, 8),
             search_sub(8, 0, 8, 8), search_sub(8, 8, 8, 8)]
    out["mv8x8"] = jnp.stack(
        [jnp.stack([p[1], p[2]], axis=-1) for p in parts], axis=1)
    out["cost8x8"] = sum(p[0] for p in parts)
    return out


# ---------------------------------------------------------------------------
# Dense (gather-free) motion search
#
# TPU gathers run through the scalar core (~25 ms per million elements on
# v5e), so the candidate loops above are HBM-gather-bound. The dense
# formulation below never gathers during search: every candidate offset is
# uniform across MBs, so a candidate's SAD map is |cur_plane - shifted ref|
# tile-reduced to (mbh, mbw) — pure VPU work. Measured: 1089 full-pel
# candidates over 1080p in ~120 ms (vs ~5.8 s for the gather funnel).
# Sub-pel refinement gathers one small window per MB once, then evaluates
# the full ±0.75-pel quarter-sample neighbourhood with static window
# slices (statically-known fractional phases need no runtime phase select).
# ---------------------------------------------------------------------------

FULL_RANGE = 16      # dense full-pel search radius
WIN = 18             # sub-pel window: 16 + 1 left/top + 1 right/bottom


def dense_full_search(cur_plane, ref_pad, lam, mb_height: int, mb_width: int,
                      row_offset, range_pel: int = FULL_RANGE):
    """Dense full-pel search. cur_plane: (bh*16, W) int-castable band
    plane; ref_pad: guard-padded full reference. Returns per-MB full-pel
    (mv_y, mv_x) and SAD of the winner, each (nmb,)."""
    H = mb_height * 16
    W = mb_width * 16
    cur = cur_plane.astype(jnp.int32)
    side = 2 * range_pel + 1

    def body(i, st):
        best_cost, best_sad, best_dy, best_dx = st
        dy = i // side - range_pel
        dx = i % side - range_pel
        sub = jax.lax.dynamic_slice(
            ref_pad, (qpel.GUARD + row_offset * 16 + dy, qpel.GUARD + dx),
            (H, W)).astype(jnp.int32)
        sad = (jnp.abs(cur - sub)
               .reshape(mb_height, 16, mb_width, 16).sum(axis=(1, 3)))
        cost = sad + lam * (mv_bits(dy * 4) + mv_bits(dx * 4))
        upd = cost < best_cost
        return (jnp.where(upd, cost, best_cost),
                jnp.where(upd, sad, best_sad),
                jnp.where(upd, dy, best_dy),
                jnp.where(upd, dx, best_dx))

    shape = (mb_height, mb_width)
    init = (jnp.full(shape, 1 << 30, jnp.int32),
            jnp.full(shape, 1 << 30, jnp.int32),
            jnp.zeros(shape, jnp.int32), jnp.zeros(shape, jnp.int32))
    _, sad, dy, dx = jax.lax.fori_loop(0, side * side, body, init)
    return dy.reshape(-1), dx.reshape(-1), sad.reshape(-1)


def gather_subpel_windows(ref_pad, hpel, base_y, base_x, mv_y, mv_x):
    """One (k, WIN, WIN) window per plane around (best - 1): the only
    gathers of the dense ME path."""
    b, h, j = hpel
    wy = base_y + mv_y - 1
    wx = base_x + mv_x - 1
    return tuple(qpel.gather_blocks(p, wy, wx, WIN, WIN).astype(jnp.int32)
                 for p in (ref_pad, b, h, j))


def _pred_from_windows(wins, dyq: int, dxq: int):
    """Quarter-pel prediction for a statically-known offset (dyq, dxq) in
    [-3, 3] relative to the window centre full-pel position. The phase is
    static, so no runtime phase selection is needed (cf. qpel.mc_luma)."""
    wf, wb, wh, wj = wins
    oy = 1 + (dyq >> 2)
    ox = 1 + (dxq >> 2)
    fy = dyq & 3
    fx = dxq & 3

    def S(w, ey=0, ex=0):
        return w[:, oy + ey:oy + ey + 16, ox + ex:ox + ex + 16]

    def avg(p, q):
        return (p + q + 1) >> 1

    table = {
        (0, 0): lambda: S(wf),
        (1, 0): lambda: avg(S(wf), S(wb)),
        (2, 0): lambda: S(wb),
        (3, 0): lambda: avg(S(wb), S(wf, 0, 1)),
        (0, 1): lambda: avg(S(wf), S(wh)),
        (1, 1): lambda: avg(S(wb), S(wh)),
        (2, 1): lambda: avg(S(wb), S(wj)),
        (3, 1): lambda: avg(S(wb), S(wh, 0, 1)),
        (0, 2): lambda: S(wh),
        (1, 2): lambda: avg(S(wh), S(wj)),
        (2, 2): lambda: S(wj),
        (3, 2): lambda: avg(S(wj), S(wh, 0, 1)),
        (0, 3): lambda: avg(S(wh), S(wf, 1, 0)),
        (1, 3): lambda: avg(S(wh), S(wb, 1, 0)),
        (2, 3): lambda: avg(S(wj), S(wb, 1, 0)),
        (3, 3): lambda: avg(S(wh, 0, 1), S(wb, 1, 0)),
    }
    return table[(fx, fy)]()


def motion_search_dense(cur_plane, cur_tiles, ref_pad, hpel,
                        base_y, base_x, qp,
                        mb_height: int, mb_width: int, row_offset,
                        enable_subpel: bool = True):
    """Gather-free ME: dense full-pel search + windowed ±0.75-pel dense
    quarter-sample refinement. Also returns the winning luma prediction
    (so 16x16 MC needs no further interpolation).

    `enable_subpel=False` stops at the full-pel winner (reference speed
    presets >= 9 skip the hpel/qpel refinement, `src/h264-lab.h:5083`).

    Returns (mv_y_q, mv_x_q, cost, pred) with pred (nmb, 16, 16) uint8.
    """
    lam = lambda_me(qp)
    fy_, fx_, _ = dense_full_search(cur_plane, ref_pad, lam,
                                    mb_height, mb_width, row_offset)
    wins = gather_subpel_windows(ref_pad, hpel, base_y, base_x, fy_, fx_)
    cur_i = cur_tiles.astype(jnp.int32)
    k = cur_i.shape[0]

    best_cost = jnp.full((k,), 1 << 30, jnp.int32)
    best_y = jnp.zeros((k,), jnp.int32)
    best_x = jnp.zeros((k,), jnp.int32)
    best_pred = jnp.zeros((k, 16, 16), jnp.int32)
    sweep = range(-3, 4) if enable_subpel else range(0, 1)
    for dyq in sweep:
        for dxq in sweep:
            pred = _pred_from_windows(wins, dyq, dxq)
            sad = jnp.sum(jnp.abs(cur_i - pred), axis=(1, 2))
            mvy = fy_ * 4 + dyq
            mvx = fx_ * 4 + dxq
            cost = sad + lam * (mv_bits(mvy) + mv_bits(mvx))
            upd = cost < best_cost
            best_cost = jnp.where(upd, cost, best_cost)
            best_y = jnp.where(upd, mvy, best_y)
            best_x = jnp.where(upd, mvx, best_x)
            best_pred = jnp.where(upd[:, None, None], pred, best_pred)
    return best_y, best_x, best_cost, best_pred.astype(jnp.uint8)
