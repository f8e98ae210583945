#!/usr/bin/env python
"""Stage-by-stage ME profiling."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from h264lab_tpu.ops import me, qpel

W, H = 1920, 1088
mbw, mbh = W // 16, H // 16
nmb = mbw * mbh
QP = 33

rng = np.random.default_rng(0)
plane = jnp.asarray(rng.integers(0, 255, (H, W), np.uint8))
ref = jnp.asarray(rng.integers(0, 255, (H, W), np.uint8))
ref_pad = jnp.pad(ref, qpel.GUARD, mode="edge")
ref4 = me.downsample4(ref)
g4 = qpel.GUARD // 4
ref4_pad = jnp.pad(ref4, g4, mode="edge")
tiles = (plane.reshape(mbh, 16, mbw, 16).transpose(0, 2, 1, 3)
         .reshape(nmb, 16, 16))
rr = jnp.arange(nmb, dtype=jnp.int32) // mbw
cc = jnp.arange(nmb, dtype=jnp.int32) % mbw
base_y = qpel.GUARD + 16 * rr
base_x = qpel.GUARD + 16 * cc
zeros = jnp.zeros((nmb,), jnp.int32)
lam = me.lambda_me(jnp.int32(QP))


def t(fn, *a, n=10):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(n):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.time() - t0) / n * 1e3


cur4 = me.downsample4(plane)
f_coarse = jax.jit(lambda c4: me.coarse_search_4x(
    c4, ref4_pad, lam, mbh, mbw, 0, zeros, zeros))
print("coarse_4x          %.1f ms" % t(f_coarse, cur4))

cy4, cx4 = f_coarse(cur4)


def win_gather(cy, cx):
    d = jnp.arange(me.WIN_S, dtype=jnp.int32)
    wy = base_y + 4 * cy - me.WIN_M
    wx = base_x + 4 * cx - me.WIN_M
    yy = wy[:, None, None] + d[None, :, None]
    xx = wx[:, None, None] + d[None, None, :]
    return ref_pad[yy, xx].astype(jnp.int32)


f_win = jax.jit(win_gather)
print("win gather 34x34   %.1f ms" % t(f_win, cy4, cx4))
win = f_win(cy4, cx4)

cur_i = tiles.astype(jnp.int32)


def fullpel(win):
    best = jnp.full((nmb,), 1 << 30, jnp.int32)
    bdy = jnp.zeros((nmb,), jnp.int32)
    bdx = jnp.zeros((nmb,), jnp.int32)
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            blk = win[:, 9 + dy:9 + dy + 16, 9 + dx:9 + dx + 16]
            sad = jnp.sum(jnp.abs(cur_i - blk), axis=(1, 2))
            upd = sad < best
            best = jnp.where(upd, sad, best)
            bdy = jnp.where(upd, dy, bdy)
            bdx = jnp.where(upd, dx, bdx)
    return best, bdy, bdx


f_fp = jax.jit(fullpel)
print("fullpel sweep 49   %.1f ms" % t(f_fp, win))

f_hpel = jax.jit(me._hpel_from_window)
print("hpel from window   %.1f ms" % t(f_hpel, win))
bb, hh, jj = f_hpel(win)
_, bdy, bdx = f_fp(win)
o_y = me.WIN_M + bdy
o_x = me.WIN_M + bdx


def extract4(o_y, o_x):
    F = me._extract(win, o_y - 3, o_x - 3, me.SUB)
    B = me._extract(bb, o_y - 3, o_x - 5, me.SUB)
    H_ = me._extract(hh, o_y - 5, o_x - 3, me.SUB)
    J = me._extract(jj, o_y - 5, o_x - 5, me.SUB)
    return F, B, H_, J


f_ex = jax.jit(extract4)
print("extract 4x22x22    %.1f ms" % t(f_ex, o_y, o_x))
wins = f_ex(o_y, o_x)


def sweep(wins):
    best_cost = jnp.full((nmb,), 1 << 30, jnp.int32)
    best_pred = jnp.zeros((nmb, 16, 16), jnp.int32)
    for dyq in range(-3, 4):
        for dxq in range(-3, 4):
            pred = me.pred_from_windows(wins, dyq, dxq, center=3)
            sad = jnp.sum(jnp.abs(cur_i - pred), axis=(1, 2))
            upd = sad < best_cost
            best_cost = jnp.where(upd, sad, best_cost)
            best_pred = jnp.where(upd[:, None, None], pred, best_pred)
    return best_cost, best_pred


f_sw = jax.jit(sweep)
print("qpel sweep 49      %.1f ms" % t(f_sw, wins))


# transposed-layout variant: window data as (34, 34, nmb)
def win_gather_T(cy, cx):
    d = jnp.arange(me.WIN_S, dtype=jnp.int32)
    wy = base_y + 4 * cy - me.WIN_M
    wx = base_x + 4 * cx - me.WIN_M
    yy = wy[None, None, :] + d[:, None, None]
    xx = wx[None, None, :] + d[None, :, None]
    return ref_pad[yy, xx].astype(jnp.int32)


f_winT = jax.jit(win_gather_T)
print("win gather T       %.1f ms" % t(f_winT, cy4, cx4))
winT = f_winT(cy4, cx4)
curT = jnp.transpose(cur_i, (1, 2, 0))


def fullpelT(winT):
    best = jnp.full((nmb,), 1 << 30, jnp.int32)
    bdy = jnp.zeros((nmb,), jnp.int32)
    bdx = jnp.zeros((nmb,), jnp.int32)
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            blk = winT[9 + dy:9 + dy + 16, 9 + dx:9 + dx + 16]
            sad = jnp.sum(jnp.abs(curT - blk), axis=(0, 1))
            upd = sad < best
            best = jnp.where(upd, sad, best)
            bdy = jnp.where(upd, dy, bdy)
            bdx = jnp.where(upd, dx, bdx)
    return best, bdy, bdx


f_fpT = jax.jit(fullpelT)
print("fullpel sweep T    %.1f ms" % t(f_fpT, winT))
