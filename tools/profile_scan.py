#!/usr/bin/env python
"""Isolate wavefront-scan overhead vs body cost on the real chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from h264lab_tpu.models import mbscan, wavefront, refstate
from h264lab_tpu.ops import me, qpel
from h264lab_tpu.utils.synthetic import chessboard_sequence

W, H = 1920, 1088
MBW, MBH = W // 16, H // 16
NMB = MBW * MBH
QP = 33


def t(fn, *a, n=10):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(n):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.time() - t0) / n * 1e3


def main():
    frames = list(chessboard_sequence(W, H, 2))
    y0, u0, v0 = frames[0]
    y1, u1, v1 = frames[1]
    ty = jnp.asarray(wavefront.mb_tiles(np.asarray(y1), 16))
    tu = jnp.asarray(wavefront.mb_tiles(np.asarray(u1), 8))
    tv = jnp.asarray(wavefront.mb_tiles(np.asarray(v1), 8))
    ry = jnp.asarray(wavefront.mb_tiles(np.asarray(y0), 16))
    ru = jnp.asarray(wavefront.mb_tiles(np.asarray(u0), 8))
    rv = jnp.asarray(wavefront.mb_tiles(np.asarray(v0), 8))
    ref = refstate.prepare_reference(ry, ru, rv, MBW, MBH)
    jax.block_until_ready(ref)

    # 0) dispatch round-trip for a trivial jit
    f0 = jax.jit(lambda x: x + 1)
    print("trivial jit (1,)              %.3f ms" % t(f0, jnp.zeros((1,), jnp.int32), n=50))

    plan = wavefront.make_plan(MBW, MBH, slope=1)
    steps = jnp.asarray(plan.steps)
    n_steps, kmax = plan.steps.shape
    print("slope-1 plan: %d steps, kmax %d" % (n_steps, kmax))

    # 1) empty scan: same xs sizes, trivial body
    steps_w = jnp.where(steps < 0, NMB, steps)

    def diag_order(x, fill=0):
        pad = jnp.full((1,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad])[steps_w]

    @jax.jit
    def empty_scan(src_y):
        xs = dict(idx=steps, src_y=diag_order(src_y))
        E0 = jnp.zeros((NMB + 1, 72), jnp.uint8)

        def step(E, xt):
            return E, dict(s=jnp.sum(xt["src_y"].astype(jnp.int32), axis=(1, 2)))
        _, ys = jax.lax.scan(step, E0, xs)
        return ys["s"]

    print("empty scan (187 steps)        %.1f ms" % t(empty_scan, ty))

    # 2) carry-only scan: gather/scatter E like the real one, no compute
    @jax.jit
    def carry_scan(src_y):
        xs = dict(idx=steps, src_y=diag_order(src_y))
        E0 = jnp.zeros((NMB + 1, 72), jnp.uint8)

        def step(E, xt):
            idx = xt["idx"]
            cidx = jnp.maximum(idx, 0)
            widx = jnp.where(idx >= 0, cidx, NMB)
            tidx = jnp.maximum(cidx - MBW, 0)
            lidx = jnp.maximum(cidx - 1, 0)
            Et = E[tidx]; El = E[lidx]
            rec = Et + El + xt["src_y"][:, 0, 0:1]
            E = E.at[widx].set(rec, mode="drop")
            return E, dict(s=rec[:, 0])
        _, ys = jax.lax.scan(step, E0, xs)
        return ys["s"]

    print("carry scan (gather+scatter)   %.1f ms" % t(carry_scan, ty))

    # 3) i16-body scan: the real intra16+chroma body, minus inter xs
    from h264lab_tpu.ops import intra, transform
    from h264lab_tpu.ops.tuning import INTRA_DEADZONE_Q8

    @jax.jit
    def i16_scan(src_y, src_u, src_v):
        a_top = jnp.asarray(np.arange(NMB) // MBW > 0)
        a_left = jnp.asarray(np.arange(NMB) % MBW > 0)
        xs = dict(idx=steps, a_top=diag_order(a_top, False),
                  a_left=diag_order(a_left, False),
                  src_y=diag_order(src_y), src_u=diag_order(src_u),
                  src_v=diag_order(src_v))
        E0 = jnp.zeros((NMB + 1, 72), jnp.uint8)
        qp = jnp.int32(QP); qpc = jnp.int32(30)

        def step(E, xt):
            idx = xt["idx"]
            cidx = jnp.maximum(idx, 0)
            widx = jnp.where(idx >= 0, cidx, NMB)
            tidx = jnp.maximum(cidx - MBW, 0)
            lidx = jnp.maximum(cidx - 1, 0)
            Et = E[tidx]; El = E[lidx]
            src_y_ = xt["src_y"]
            preds, valid = intra.predict_16x16(
                Et[:, 0:16], El[:, 16:32], xt["a_top"], xt["a_left"])
            m16, pred_y16, cost16 = intra.select_mode(src_y_, preds, valid)
            dc_lev, ac_lev16, rec_y16 = mbscan._encode_luma_i16(
                src_y_, pred_y16, qp)
            k = cidx.shape[0]
            top_c = jnp.concatenate([Et[:, 32:40], Et[:, 48:56]])
            left_c = jnp.concatenate([El[:, 40:48], El[:, 56:64]])
            a2 = jnp.concatenate([xt["a_top"], xt["a_top"]])
            l2 = jnp.concatenate([xt["a_left"], xt["a_left"]])
            preds_c, valid_c = intra.predict_chroma(top_c, left_c, a2, l2)
            src_c = jnp.concatenate([xt["src_u"], xt["src_v"]])
            cc2 = intra.sad(src_c[:, None], preds_c)
            cc = cc2[:k] + cc2[k:]
            cm = jnp.argmin(jnp.where(valid_c[:k], cc, 1 << 30), axis=1)
            cm2 = jnp.concatenate([cm, cm]).astype(jnp.int32)
            pred_c = jnp.take_along_axis(
                preds_c, cm2[:, None, None, None], axis=1)[:, 0]
            cdc, cac, rec_c = mbscan._encode_chroma(
                src_c, pred_c, qpc, INTRA_DEADZONE_Q8)
            rec_new = jnp.concatenate([
                rec_y16[:, -1, :], rec_y16[:, :, -1],
                rec_c[:k, -1, :], rec_c[:k, :, -1],
                rec_c[k:, -1, :], rec_c[k:, :, -1],
                jnp.zeros((k, 8), jnp.uint8)], axis=1)
            E = E.at[widx].set(rec_new, mode="drop")
            return E, dict(m=m16)
        _, ys = jax.lax.scan(step, E0, xs)
        return ys["m"]

    print("i16-body scan                 %.1f ms" % t(i16_scan, ty, tu, tv, n=5))

    # 4) deblock alone
    sel = jnp.ones((NMB,), jnp.int32)       # all intra -> strong filters
    nnz = jnp.ones((NMB, 4, 4), jnp.int32)
    mv4 = jnp.zeros((NMB, 4, 4), jnp.int32)
    a_top = jnp.asarray(np.arange(NMB) // MBW > 0)
    a_left = jnp.asarray(np.arange(NMB) % MBW > 0)

    @jax.jit
    def dbl(ryy, ruu, rvv):
        return mbscan.deblock_frame(ryy, ruu, rvv, sel, nnz, mv4, mv4,
                                    jnp.int32(QP), jnp.int32(30),
                                    a_top, a_left, MBW, MBH)
    print("deblock_frame                 %.1f ms" % t(dbl, ry, ru, rv, n=5))

    # 5) symbolize alone (I-frame shaped inputs)
    @jax.jit
    def sym(ac):
        return mbscan.symbolize(
            jnp.ones((NMB,), jnp.int32), jnp.zeros((NMB,), jnp.int32),
            jnp.zeros((NMB,), jnp.int32), jnp.full((NMB, 16), 2, jnp.int32),
            jnp.zeros((NMB, 16), jnp.uint32), jnp.zeros((NMB, 16), jnp.int32),
            jnp.zeros((NMB, 4, 4), jnp.int32), jnp.zeros((NMB, 4, 4), jnp.int32),
            jnp.zeros((NMB,), jnp.int32),
            jnp.zeros((NMB, 4, 4), jnp.int32), ac, ac,
            jnp.zeros((NMB, 2, 2, 2), jnp.int32),
            jnp.zeros((NMB, 2, 2, 2, 4, 4), jnp.int32),
            MBW, MBH, True)["total_bits"]
    ac = jnp.zeros((NMB, 4, 4, 4, 4), jnp.int32)
    print("symbolize                     %.1f ms" % t(sym, ac, n=5))


if __name__ == "__main__":
    main()
