#!/usr/bin/env python
"""Microbenchmarks that inform the scan restructure design."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

NMB = 8160  # 1080p


def t(fn, *a, n=20):
    o = fn(*a); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(n):
        o = fn(*a)
    jax.block_until_ready(o)
    return (time.time() - t0) / n * 1e3


key = jax.random.PRNGKey(0)
tiles = jax.random.randint(key, (NMB, 16, 16), 0, 255, jnp.int32).astype(jnp.uint8)
perm = jnp.asarray(np.random.permutation(NMB))

# row gather of whole tiles
f1 = jax.jit(lambda x, p: x[p])
print("row-gather (8160,16,16)u8      %.2f ms" % t(f1, tiles, perm))

tiles32 = tiles.astype(jnp.int32)
f1b = jax.jit(lambda x, p: x[p])
print("row-gather (8160,16,16)i32     %.2f ms" % t(f1b, tiles32, perm))

# row scatter
f2 = jax.jit(lambda x, p, v: x.at[p].set(v))
print("row-scatter (8160,16,16)u8     %.2f ms" % t(f2, tiles, perm, tiles))

# element gather: windows
plane = jax.random.randint(key, (1128, 1960), 0, 255, jnp.int32).astype(jnp.uint8)
ys = jax.random.randint(key, (NMB,), 0, 1100, jnp.int32)
xs_ = jax.random.randint(key, (NMB,), 0, 1930, jnp.int32)


def win(p, ys, xs, W):
    dy = jnp.arange(W)
    yy = ys[:, None, None] + dy[None, :, None]
    xx = xs[:, None, None] + dy[None, None, :]
    return p[yy, xx]


f3 = jax.jit(lambda p, y, x: win(p, y, x, 24))
print("elem-gather (8160,24,24)u8     %.2f ms" % t(f3, plane, ys, xs_))

# packed u32 window gather: 7 words x 24 rows
plane32 = jax.random.randint(key, (1128, 512), 0, 1 << 30, jnp.int32)
xw = xs_ // 4


def win32(p, ys, xs):
    dy = jnp.arange(24)
    dx = jnp.arange(8)
    yy = ys[:, None, None] + dy[None, :, None]
    xx = xs[:, None, None] + dx[None, None, :]
    return p[yy, xx]


f4 = jax.jit(win32)
print("elem-gather (8160,24,8)i32     %.2f ms" % t(f4, plane32, ys, xw))

# dynamic_slice-in-vmap alternative for windows
f5 = jax.jit(jax.vmap(lambda y, x: jax.lax.dynamic_slice(plane, (y, x), (24, 24))))
print("vmap dynslice (8160,24,24)u8   %.2f ms" % t(f5, ys, xs_))

# scan step overhead: 187 steps, trivial body with k gathers+1 scatter
E = jnp.zeros((NMB + 1, 72), jnp.uint8)
steps = jnp.asarray(np.random.randint(0, NMB, (187, 68)), jnp.int32)


def scan_body(nops):
    def step(carry, xs):
        idx = xs
        acc = carry[jnp.maximum(idx - 1, 0)]
        for _ in range(nops):
            acc = acc + 1
        carry = carry.at[idx].set(acc, mode="drop")
        return carry, acc.sum(axis=-1)
    def run(E):
        return jax.lax.scan(step, E, steps)
    return jax.jit(run)


for nops in (1, 20, 60):
    print("scan 187x(2 g/s + %2d adds)     %.2f ms" % (nops, t(scan_body(nops), E, n=10)))

# scan with a fat carry scatter: (nmb,16,16) u8 tile scatter per step
def scan_fat():
    def step(carry, xs):
        tilesC, = carry
        idx = xs
        v = tilesC[jnp.maximum(idx - 1, 0)] + 1
        tilesC = tilesC.at[idx].set(v, mode="drop")
        return (tilesC,), None
    def run(T):
        return jax.lax.scan(step, (T,), steps)
    return jax.jit(run)


Tpad = jnp.zeros((NMB + 1, 16, 16), jnp.uint8)
print("scan 187x tile gather+scatter  %.2f ms" % t(scan_fat(), Tpad, n=10))

# ys output instead
def scan_ys():
    def step(carry, xs):
        idx = xs
        v = carry[jnp.maximum(idx - 1, 0)] + 1
        carry = carry.at[idx].set(v[:, 0], mode="drop")
        return carry, v
    def run(E):
        return jax.lax.scan(step, E, steps)
    return jax.jit(run)


E2 = jnp.zeros((NMB + 1, 256), jnp.uint8)
print("scan 187x ys(68,256) output    %.2f ms" % t(scan_ys(), E2, n=10))
