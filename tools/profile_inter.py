#!/usr/bin/env python
"""Break down the P-frame inter stage + symbolize on the real chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from h264lab_tpu.models import mbscan, wavefront, refstate
from h264lab_tpu.ops import me, qpel
from h264lab_tpu.ops.tuning import INTER_DEADZONE_Q8
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

    rr = jnp.arange(NMB, dtype=jnp.int32) // MBW
    cc = jnp.arange(NMB, dtype=jnp.int32) % MBW
    base_y = qpel.GUARD + 16 * rr
    base_x = qpel.GUARD + 16 * cc
    cur_plane = (ty.reshape(MBH, MBW, 16, 16).transpose(0, 2, 1, 3)
                 .reshape(MBH * 16, MBW * 16))

    f_me = jax.jit(lambda cp, tt: me.motion_search_dense(
        cp, tt, ref["y_pad"], ref["y4_pad"], base_y, base_x, jnp.int32(QP),
        MBH, MBW, 0))
    print("me_hier (new coarse)          %.1f ms" % t(f_me, cur_plane, ty))

    f_coarse = jax.jit(lambda cp: me.coarse_search_4x(
        me.downsample4(cp), ref["y4_pad"], me.lambda_me(jnp.int32(QP)),
        MBH, MBW, 0, jnp.zeros((NMB,), jnp.int32), jnp.zeros((NMB,), jnp.int32)))
    print("  coarse stage                %.1f ms" % t(f_coarse, cur_plane))

    # inter TQ (luma)
    mvy, mvx, cost16, pred16, aux = f_me(cur_plane, ty)
    pred16 = jnp.asarray(pred16)

    f_tq = jax.jit(lambda s, p: mbscan._encode_inter_luma(s, p, jnp.int32(QP)))
    print("inter luma TQ                 %.1f ms" % t(f_tq, ty, pred16))

    f_ctq = jax.jit(lambda s, p: mbscan._encode_chroma(
        s, p, jnp.int32(30), INTER_DEADZONE_Q8))
    src_c = jnp.concatenate([tu, tv])
    print("chroma TQ (2 planes)          %.1f ms" % t(f_ctq, src_c, src_c))

    # chroma MC uniform
    cb_y = qpel.GUARD // 2 + 8 * rr
    cb_x = qpel.GUARD // 2 + 8 * cc
    f_cmc = jax.jit(lambda my, mx: qpel.mc_chroma_uniform(
        ref["u_pad"], ref["v_pad"], cb_y, cb_x,
        aux["full_my"], aux["full_mx"], my, mx))
    print("chroma MC uniform             %.1f ms" % t(f_cmc, mvy, mvx))

    # diag_order cost: 9 gathers like the scan setup
    plan = wavefront.make_plan(MBW, MBH, slope=1)
    steps = jnp.asarray(plan.steps)
    steps_w = jnp.where(steps < 0, NMB, steps)

    @jax.jit
    def diag9(x16, x8):
        def d(x):
            pad = jnp.full((1,) + x.shape[1:], 0, x.dtype)
            return jnp.concatenate([x, pad])[steps_w]
        outs = [d(x16), d(x16), d(x8), d(x8), d(x8), d(x8)]
        return [o.sum() for o in outs]
    print("diag_order x6 (16x16 + 8x8)   %.1f ms" % t(diag9, ty, tu))

    # undiag: 10 gathers back
    n_steps, kmax = plan.steps.shape
    inv = (jnp.zeros((NMB,), jnp.int32)
           .at[steps_w.reshape(-1)]
           .set(jnp.arange(n_steps * kmax, dtype=jnp.int32), mode="drop"))
    big = jnp.zeros((n_steps, kmax, 16, 16), jnp.uint8)

    @jax.jit
    def undiag6(b):
        outs = []
        for _ in range(6):
            outs.append(b.reshape((n_steps * kmax, 16, 16))[inv])
            b = b + 1
        return [o.sum() for o in outs]
    print("undiag x6 (16x16)             %.1f ms" % t(undiag6, big))

    # full encode_frame without deblock (new code)
    steps2, a_top, a_left = (jnp.asarray(plan.steps),
                             jnp.asarray(np.arange(NMB) // MBW > 0),
                             jnp.asarray(np.arange(NMB) % MBW > 0))

    def scan_only(ty_, tu_, tv_):
        return mbscan.encode_frame(
            ty_, tu_, tv_, ref["y_pad"], ref["u_pad"], ref["v_pad"],
            ref["y4_pad"], jnp.int32(QP), jnp.int32(30),
            steps2, a_top, a_left,
            MBW, MBH, has_inter=True, enable_i4x4=False,
            enable_deblock=False, enable_partitions=False,
            enable_qpel=True, mb_row_offset=jnp.int32(0))
    print("P encode_frame nodeblock      %.1f ms" % t(scan_only, ty, tu, tv, n=5))

    def scan_dbl(ty_, tu_, tv_):
        return mbscan.encode_frame(
            ty_, tu_, tv_, ref["y_pad"], ref["u_pad"], ref["v_pad"],
            ref["y4_pad"], jnp.int32(QP), jnp.int32(30),
            steps2, a_top, a_left,
            MBW, MBH, has_inter=True, enable_i4x4=False,
            enable_deblock=True, enable_partitions=False,
            enable_qpel=True, mb_row_offset=jnp.int32(0))
    print("P encode_frame +deblock       %.1f ms" % t(scan_dbl, ty, tu, tv, n=5))


if __name__ == "__main__":
    main()
