#!/usr/bin/env python
"""Microbench: gather-replacement strategies for ME windows."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

NMB = 8160
H, W = 1168, 2000
rng = np.random.default_rng(0)
plane = jnp.asarray(rng.integers(0, 255, (H, W), np.uint8))
ys = jnp.asarray(rng.integers(0, H - 64, NMB, ).astype(np.int32))
xs = jnp.asarray(rng.integers(0, W - 64, NMB).astype(np.int32))


def t(fn, *a, n=10):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(n):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.time() - t0) / n * 1e3


# 1. vmap dynamic_slice 34x34 u8
f1 = jax.jit(jax.vmap(lambda y, x: jax.lax.dynamic_slice(plane, (y, x), (34, 34))))
print("vmap dynslice 34x34 u8        %.1f ms" % t(f1, ys, xs))

# 2. u32-packed: plane as (H, W//4) int32, slice 11 words x 34 rows
plane32 = jnp.asarray(
    rng.integers(0, 255, (H, W), np.uint8).view(np.uint32).reshape(H, W // 4))
f2 = jax.jit(jax.vmap(lambda y, x: jax.lax.dynamic_slice(plane32, (y, x), (34, 11))))
print("vmap dynslice 34x11 u32       %.1f ms" % t(f2, ys, xs // 4))

# 3. elementwise gather via advanced indexing, int32 plane packed
def g3(ys, xs):
    d = jnp.arange(34)
    d2 = jnp.arange(11)
    yy = ys[:, None, None] + d[None, :, None]
    xx = (xs // 4)[:, None, None] + d2[None, None, :]
    return plane32[yy, xx]
print("elem gather 34x11 u32         %.1f ms" % t(jax.jit(g3), ys, xs))

# 4. shift-select: 7-way where on (NMB, 34, 34) i32
win = jnp.asarray(rng.integers(0, 255, (NMB, 34, 34), np.int32))
sel = jnp.asarray(rng.integers(-3, 4, NMB).astype(np.int32))
def shift_sel(win, sel):
    out = jnp.zeros((NMB, 22, 34), jnp.int32)
    for s in range(-3, 4):
        out = jnp.where((sel == s)[:, None, None],
                        win[:, 9 + s - 3:9 + s + 19, :], out)
    return out
f4 = jax.jit(shift_sel)
print("shift-select 7way y (22x34)   %.1f ms" % t(f4, win, sel))

# 5. take_along_axis last-dim gather
wide = jnp.asarray(rng.integers(0, 255, (NMB, 34, 96), np.uint8))
off = jnp.asarray(rng.integers(0, 60, NMB).astype(np.int32))
def lastdim(wide, off):
    idx = off[:, None, None] + jnp.arange(34)[None, None, :]
    return jnp.take_along_axis(wide, jnp.broadcast_to(idx, (NMB, 34, 34)), axis=2)
print("take_along last dim 34        %.1f ms" % t(jax.jit(lastdim), wide, off))

# 6. chroma mc grid current style: 2x2 gathers
from h264lab_tpu.ops import qpel
cplane = jnp.asarray(rng.integers(0, 255, (H // 2, W // 2), np.uint8))
mv4 = jnp.asarray(rng.integers(-32, 32, (NMB, 4, 4)).astype(np.int32))
cy = jnp.asarray((rng.integers(0, H // 2 - 32, NMB)).astype(np.int32))
cx = jnp.asarray((rng.integers(0, W // 2 - 32, NMB)).astype(np.int32))
f6 = jax.jit(lambda p, my, mx, by, bx: qpel.mc_chroma_grid(p, my, mx, by, bx))
print("mc_chroma_grid (current)      %.1f ms" % t(f6, cplane, mv4, mv4, cy, cx))

# 7. vmap dynslice 16x16 u8 on chroma plane (x2 planes)
f7 = jax.jit(jax.vmap(lambda y, x: jax.lax.dynamic_slice(cplane, (y, x), (16, 16))))
print("vmap dynslice 16x16 chroma    %.1f ms" % t(f7, cy, cx))

# 8. prepare_reference breakdown
from h264lab_tpu.models import refstate
tiles_y = jnp.asarray(rng.integers(0, 255, (NMB, 16, 16), np.uint8))
tiles_u = jnp.asarray(rng.integers(0, 255, (NMB, 8, 8), np.uint8))
f8 = jax.jit(lambda a, b, c: refstate.prepare_reference(a, b, c, 120, 68))
print("prepare_reference             %.1f ms" % t(f8, tiles_y, tiles_u, tiles_u))
f8b = jax.jit(lambda a: refstate.tiles_to_plane_j(a, 68, 120))
print("  tiles_to_plane              %.1f ms" % t(f8b, tiles_y))
yplane = f8b(tiles_y)
f8c = jax.jit(lambda p: qpel.pad_guard(p, 40))
print("  pad_guard                   %.1f ms" % t(f8c, yplane))
