#!/usr/bin/env python
"""Measure device bit packing + reference preparation at 1080p scale."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

from h264lab_tpu.ops import bitpack, qpel
from h264lab_tpu.models import refstate

NMB = 8160
SLOTS = 32 + 34 + 16 * 34 + 2 * 34 + 8 * 34   # per-MB symbol slots
N = NMB * SLOTS


def t(fn, *a, n=10):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(n):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.time() - t0) / n * 1e3


def main():
    print("symbol slots/frame: %.1fM" % (N / 1e6))
    rng = np.random.default_rng(0)
    lens_np = np.zeros(N, np.int32)
    # ~10% of slots occupied with 1..16-bit symbols (realistic density)
    occ = rng.random(N) < 0.10
    lens_np[occ] = rng.integers(1, 17, occ.sum())
    vals_np = rng.integers(0, 1 << 16, N).astype(np.uint32)
    vals = jnp.asarray(vals_np)
    lens = jnp.asarray(lens_np)
    total_bits = int(lens_np.sum())
    cap = bitpack.bucket_words(total_bits)
    print("total bits %.2fM, cap words %d" % (total_bits / 1e6, cap))

    f = lambda v, l: bitpack.pack_bits_device(v, l, cap)
    print("pack_bits_device              %.1f ms" % t(f, vals, lens, n=5))

    # prefix sum alone
    g = jax.jit(lambda l: jnp.cumsum(l))
    print("  cumsum 7.9M                 %.1f ms" % t(g, lens))

    # scatter-add alone
    offs = jnp.cumsum(lens) - lens
    w = (offs >> 5).astype(jnp.int32)

    @jax.jit
    def scat(w_, v_):
        words = jnp.zeros((cap,), jnp.uint32)
        return words.at[w_].add(v_, mode="drop")
    print("  scatter-add 7.9M            %.1f ms" % t(scat, w, vals, n=5))

    # prepare_reference pieces
    ry = jnp.asarray(rng.integers(0, 255, (NMB, 16, 16)).astype(np.uint8))
    ru = jnp.asarray(rng.integers(0, 255, (NMB, 8, 8)).astype(np.uint8))
    rv = jnp.asarray(rng.integers(0, 255, (NMB, 8, 8)).astype(np.uint8))
    fr = jax.jit(lambda a, b, c: refstate.prepare_reference(a, b, c, 120, 68))
    print("prepare_reference             %.1f ms" % t(fr, ry, ru, rv))

    f1 = jax.jit(lambda a: refstate.tiles_to_plane_j(a, 68, 120))
    print("  tiles_to_plane luma         %.1f ms" % t(f1, ry))
    y = f1(ry)
    f2 = jax.jit(lambda p: qpel.pad_guard(p, qpel.GUARD))
    print("  pad_guard luma              %.1f ms" % t(f2, y))

    @jax.jit
    def down(yy):
        h4 = yy.shape[0] // 4
        w4 = yy.shape[1] // 4
        return ((yy.astype(jnp.int32).reshape(h4, 4, w4, 4).sum(axis=(1, 3))
                 + 8) >> 4).astype(jnp.uint8)
    print("  4x downsample               %.1f ms" % t(down, y))


if __name__ == "__main__":
    main()
