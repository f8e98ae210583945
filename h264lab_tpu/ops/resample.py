"""SVC spatial resampling: 2x frame downsampling for the base layer and
the normative-style 4-tap / bilinear intra upsampling for inter-layer
prediction.

Reference equivalents: `h264e_frame_downsampling` (`src/h264-lab.h:2984-3048`)
and `h264e_intra_upsampling` (`:3078-3183`, 16-phase 4-tap luma filter
`g_filter16_luma` `:3058-3076`). Batched whole-plane XLA ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 16-phase 4-tap luma upsampling filter (SVC normative family); for the
# dyadic 2x case only phases 4 and 12 are exercised.
FILTER16_LUMA = np.array([
    [0, 32, 0, 0], [-1, 32, 2, -1], [-2, 31, 4, -1], [-3, 30, 6, -1],
    [-3, 28, 8, -1], [-4, 26, 11, -1], [-4, 24, 14, -2], [-3, 22, 16, -3],
    [-3, 19, 19, -3], [-3, 16, 22, -3], [-2, 14, 24, -4], [-1, 11, 26, -4],
    [-1, 8, 28, -3], [-1, 6, 30, -3], [-1, 4, 31, -2], [-1, 2, 32, -1],
], dtype=np.int32)


def downsample2x(plane: jnp.ndarray) -> jnp.ndarray:
    """Dyadic 2x downsampling by 2x2 box average (the reference's
    bilinear decimation), uint8 -> uint8."""
    h, w = plane.shape
    x = plane[:h - h % 2, :w - w % 2].astype(jnp.int32)
    x = x.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
    return ((x + 2) >> 2).astype(jnp.uint8)


def _upsample_axis_luma(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """2x luma upsampling along one axis with the 4-tap phases 4/12."""
    x = jnp.moveaxis(x, axis, 0).astype(jnp.int32)
    pad = jnp.pad(x, ((2, 2),) + ((0, 0),) * (x.ndim - 1), mode="edge")
    n = x.shape[0]
    # output sample 2i   <- phase 4 centred between src i-1..i+2
    # output sample 2i+1 <- phase 12
    f4 = FILTER16_LUMA[4]
    f12 = FILTER16_LUMA[12]

    def tap(f, off):
        return (f[0] * pad[off:off + n] + f[1] * pad[off + 1:off + 1 + n]
                + f[2] * pad[off + 2:off + 2 + n]
                + f[3] * pad[off + 3:off + 3 + n])

    even = tap(f4, 1)
    odd = tap(f12, 1)
    out = jnp.stack([even, odd], axis=1).reshape((2 * n,) + x.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def upsample2x_luma(plane: jnp.ndarray) -> jnp.ndarray:
    """Dyadic 2x intra upsampling (separable 4-tap), uint8 -> uint8.
    Normalization: two passes of gain 32 -> (x + 512) >> 10."""
    t = _upsample_axis_luma(plane, 0)
    t = _upsample_axis_luma(t, 1)
    return jnp.clip((t + 512) >> 10, 0, 255).astype(jnp.uint8)


def upsample2x_chroma(plane: jnp.ndarray) -> jnp.ndarray:
    """Dyadic 2x chroma upsampling (bilinear, phases 1/4 and 3/4)."""
    x = plane.astype(jnp.int32)

    def up_axis(a, axis):
        a = jnp.moveaxis(a, axis, 0)
        pad = jnp.pad(a, ((1, 1),) + ((0, 0),) * (a.ndim - 1), mode="edge")
        n = a.shape[0]
        even = 3 * pad[1:1 + n] + pad[0:n]          # phase 1/4
        odd = 3 * pad[1:1 + n] + pad[2:2 + n]       # phase 3/4
        out = jnp.stack([even, odd], axis=1).reshape((2 * n,) + a.shape[1:])
        return jnp.moveaxis(out, 0, axis)

    t = up_axis(x, 0)
    t = up_axis(t, 1)
    return jnp.clip((t + 8) >> 4, 0, 255).astype(jnp.uint8)
