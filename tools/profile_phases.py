#!/usr/bin/env python
"""Per-phase timing of the 1080p P-frame pipeline on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from h264lab_tpu.config import EncoderConfig, RunConfig
from h264lab_tpu.models.encoder import H264Encoder
from h264lab_tpu.models import mbscan, refstate, wavefront
from h264lab_tpu.ops import me, qpel
from h264lab_tpu.utils.synthetic import chessboard_sequence

W, H = 1920, 1088
QP = 33


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    frames = list(chessboard_sequence(W, H, 3))
    cfg = EncoderConfig(width=W, height=H, gop=20, qp=QP)
    enc = H264Encoder(cfg)

    r0 = enc.encode(*frames[0], RunConfig(qp_min=QP, qp_max=QP, encode_speed=2))
    ty, tu, tv = enc._pad_tiles(*frames[1])
    ref = enc._refs[0]
    mbw, mbh = cfg.mb_width, cfg.mb_height
    nmb = mbw * mbh
    rr = jnp.arange(nmb, dtype=jnp.int32) // mbw
    cc = jnp.arange(nmb, dtype=jnp.int32) % mbw
    base_y = qpel.GUARD + 16 * rr
    base_x = qpel.GUARD + 16 * cc
    ty_j = jnp.asarray(ty); tu_j = jnp.asarray(tu); tv_j = jnp.asarray(tv)

    cur_plane = (ty_j.reshape(mbh, mbw, 16, 16).transpose(0, 2, 1, 3)
                 .reshape(mbh * 16, mbw * 16))

    f_me = jax.jit(lambda cp, t: me.motion_search_dense(
        cp, t, ref["y_pad"], ref["y4_pad"], base_y, base_x, jnp.int32(QP),
        mbh, mbw, 0)[:4])
    print("me_hier           %.1f ms" % (1e3 * timeit(f_me, cur_plane, ty_j)))

    f_ref = jax.jit(lambda a, b, c: refstate.prepare_reference(a, b, c, mbw, mbh))
    print("prepare_reference %.1f ms" % (
        1e3 * timeit(f_ref, ty_j, tu_j, tv_j)))

    # --- scan-only: P no deblock ---
    steps, a_top, a_left = enc._band_arrays(mbh, 1)
    def scan_only(ty_, tu_, tv_):
        return mbscan.encode_frame(
            ty_, tu_, tv_, ref["y_pad"], ref["u_pad"], ref["v_pad"],
            ref["y4_pad"], jnp.int32(QP), jnp.int32(30),
            steps, a_top, a_left,
            mbw, mbh, has_inter=True, enable_i4x4=False,
            enable_deblock=False, enable_partitions=False,
            enable_qpel=True, mb_row_offset=jnp.int32(0))
    print("P scan nodeblock  %.1f ms" % (1e3 * timeit(scan_only, ty_j, tu_j, tv_j, n=3)))

    def scan_dbl(ty_, tu_, tv_):
        return mbscan.encode_frame(
            ty_, tu_, tv_, ref["y_pad"], ref["u_pad"], ref["v_pad"],
            ref["y4_pad"], jnp.int32(QP), jnp.int32(30),
            steps, a_top, a_left,
            mbw, mbh, has_inter=True, enable_i4x4=False,
            enable_deblock=True, enable_partitions=False,
            enable_qpel=True, mb_row_offset=jnp.int32(0))
    print("P scan +deblock   %.1f ms" % (1e3 * timeit(scan_dbl, ty_j, tu_j, tv_j, n=3)))

    # --- whole frame at several speeds ---
    for speed, label in ((2, "P speed2 (deblock on)"),
                         (0, "P speed0 (partitions)")):
        run = RunConfig(qp_min=QP, qp_max=QP, encode_speed=speed)
        enc2 = H264Encoder(cfg)
        enc2.encode(*frames[0], run)
        def do(f):
            return enc2.encode(*f, run)
        do(frames[1]); do(frames[2])
        t0 = time.time(); do(frames[1]); do(frames[2])
        print("frame %-28s %.1f ms" % (label, 1e3 * (time.time() - t0) / 2))

    # --- host-side pack cost (finish on a pre-dispatched frame) ---
    run = RunConfig(qp_min=QP, qp_max=QP, encode_speed=2)
    p = enc.encode_async(*frames[2], run)
    jax.block_until_ready(p.band_outs[0]["sym_vals"])
    t0 = time.time()
    enc.finish(p)
    print("host finish()                      %.1f ms" % (1e3 * (time.time() - t0)))

    # --- intra frame ---
    runI = RunConfig(qp_min=QP, qp_max=QP, encode_speed=2)
    encI = H264Encoder(EncoderConfig(width=W, height=H, gop=1, qp=QP))
    encI.encode(*frames[0], runI)
    t0 = time.time(); encI.encode(*frames[1], runI); encI.encode(*frames[2], runI)
    print("frame I (gop=1, i4x4 on)           %.1f ms" % (1e3 * (time.time() - t0) / 2))


if __name__ == "__main__":
    main()
