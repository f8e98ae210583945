#!/usr/bin/env python
"""Lane-batched (G=8) per-phase timing of the 1080p P pipeline on the
real chip — the decomposition of one GopBandEncoder step. Run on TPU."""

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
from h264lab_tpu.ops import bitpack, me, qpel
from h264lab_tpu.parallel.gop import GopBandEncoder
from h264lab_tpu.utils.synthetic import chessboard_sequence

W, H = 1920, 1088
QP = 33
G = int(os.environ.get("G", "8"))


def timeit(fn, *args, n=4, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    frames = list(chessboard_sequence(W, H, 2))
    cfg = EncoderConfig(width=W, height=H, gop=20, qp=QP)
    enc = H264Encoder(cfg)
    run = RunConfig(qp_min=QP, qp_max=QP, encode_speed=2)
    enc.encode(*frames[0], run)
    ty, tu, tv = enc._pad_tiles(*frames[1])
    ref1 = enc._refs[0]
    ref = {k: jnp.broadcast_to(v, (G,) + v.shape) for k, v in ref1.items()}
    mbw, mbh = cfg.mb_width, cfg.mb_height
    nmb = mbw * mbh
    rr = jnp.arange(nmb, dtype=jnp.int32) // mbw
    cc = jnp.arange(nmb, dtype=jnp.int32) % mbw
    base_y = qpel.GUARD + 16 * rr
    base_x = qpel.GUARD + 16 * cc
    tyG = jnp.broadcast_to(jnp.asarray(ty), (G,) + ty.shape)
    tuG = jnp.broadcast_to(jnp.asarray(tu), (G,) + tu.shape)
    tvG = jnp.broadcast_to(jnp.asarray(tv), (G,) + tv.shape)

    cur_plane1 = (jnp.asarray(ty).reshape(mbh, mbw, 16, 16)
                  .transpose(0, 2, 1, 3).reshape(mbh * 16, mbw * 16))
    cpG = jnp.broadcast_to(cur_plane1, (G,) + cur_plane1.shape)

    # --- ME only, vmapped over lanes ---
    f_me = jax.jit(jax.vmap(lambda cp, t, ry, r4: me.motion_search_dense(
        cp, t, ry, r4, base_y, base_x, jnp.int32(QP), mbh, mbw, 0)[:3]))
    print("me_hier x%d        %7.1f ms" % (
        G, 1e3 * timeit(f_me, cpG, tyG, ref["y_pad"], ref["y4_pad"])))

    # --- prepare_reference x G ---
    f_ref = jax.jit(jax.vmap(
        lambda a, b, c: refstate.prepare_reference(a, b, c, mbw, mbh)))
    print("prepare_ref x%d    %7.1f ms" % (
        G, 1e3 * timeit(f_ref, tyG, tuG, tvG)))

    steps, a_top, a_left = enc._band_arrays(mbh, 1)

    def frame_fn(deblock):
        def one(ty_, tu_, tv_, ry, ru, rv, r4):
            return mbscan.encode_frame_core(
                ty_, tu_, tv_, ry, ru, rv, r4,
                jnp.int32(QP), jnp.int32(30), steps, a_top, a_left,
                mbw, mbh, has_inter=True, enable_i4x4=False,
                enable_deblock=deblock, enable_partitions=False,
                enable_qpel=True, mb_row_offset=jnp.int32(0))
        return jax.jit(jax.vmap(one))

    f_nod = frame_fn(False)
    print("P full nodeblk x%d %7.1f ms" % (
        G, 1e3 * timeit(f_nod, tyG, tuG, tvG, ref["y_pad"], ref["u_pad"],
                        ref["v_pad"], ref["y4_pad"], n=2)))
    f_dbl = frame_fn(True)
    print("P full +deblk x%d  %7.1f ms" % (
        G, 1e3 * timeit(f_dbl, tyG, tuG, tvG, ref["y_pad"], ref["u_pad"],
                        ref["v_pad"], ref["y4_pad"], n=2)))

    # --- pack only (realistic lens from a real frame) ---
    out1 = f_nod(tyG, tuG, tvG, ref["y_pad"], ref["u_pad"], ref["v_pad"],
                 ref["y4_pad"])
    sv, sl = out1["sym_vals"], out1["sym_lens"]
    print("sym slots/frame: %d, bits=%d" % (
        sv.shape[1], int(jnp.sum(sl[0]))))
    cap = 1 << 20
    f_pack = jax.jit(jax.vmap(
        lambda v, l: bitpack.pack_bits_device(v, l, cap)))
    print("pack x%d          %7.1f ms" % (
        G, 1e3 * timeit(f_pack, sv, sl)))

    # transfer of packed words to host
    words, nbits = f_pack(sv, sl)
    jax.block_until_ready(words)
    t0 = time.time()
    for _ in range(3):
        np.asarray(words)
    print("words->host x%d   %7.1f ms  (%d MB)" % (
        G, 1e3 * (time.time() - t0) / 3, words.nbytes >> 20))

    # --- full GopBandEncoder step (the bench inner loop) ---
    genc = GopBandEncoder(cfg, n_gop=G)
    lane = [frames[0]] * G
    genc.encode_step(lane, run)
    p = genc.encode_step_async([frames[1]] * G, run)
    genc.finish_step(p)
    t0 = time.time()
    n = 3
    pending = None
    for i in range(n):
        nxt = genc.encode_step_async([frames[1]] * G, run)
        if pending is not None:
            genc.finish_step(pending)
        pending = nxt
    genc.finish_step(pending)
    print("gop step e2e x%d  %7.1f ms" % (G, 1e3 * (time.time() - t0) / n))


if __name__ == "__main__":
    main()
