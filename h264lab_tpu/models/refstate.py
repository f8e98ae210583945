"""Reference-frame preparation: guard padding, half-pel planes, coarse
pyramid — computed once per reference picture on device.

The analog of the reference's recon→ref copy + guard-border replication
(`pix_copy_recon_pic_to_ref` `src/h264-lab.h:3580-3596`, `h264e_copy_borders`
`:2232-2248`), extended with the precomputed sub-pel planes that make MC a
pure gather (see ops/qpel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from h264lab_tpu.ops import qpel


def tiles_to_plane_j(tiles: jnp.ndarray, mb_height: int, mb_width: int):
    t = tiles.shape[-1]
    return (tiles.reshape(mb_height, mb_width, t, t)
            .transpose(0, 2, 1, 3)
            .reshape(mb_height * t, mb_width * t))


@functools.partial(jax.jit, static_argnames=("mb_width", "mb_height"))
def prepare_reference(recon_y_tiles, recon_u_tiles, recon_v_tiles,
                      mb_width: int, mb_height: int):
    """Build the reference-state pytree from recon tiles."""
    y = tiles_to_plane_j(recon_y_tiles, mb_height, mb_width)
    u = tiles_to_plane_j(recon_u_tiles, mb_height, mb_width)
    v = tiles_to_plane_j(recon_v_tiles, mb_height, mb_width)

    y_pad = qpel.pad_guard(y, qpel.GUARD)
    u_pad = qpel.pad_guard(u, qpel.GUARD // 2)
    v_pad = qpel.pad_guard(v, qpel.GUARD // 2)

    # coarse pyramid: 4x-downsampled unpadded plane, guard GUARD//4
    # (half-pel values are computed on the fly from per-MB ME windows —
    # see ops/me.py — so no frame-level half-pel planes are stored)
    h4 = y.shape[0] // 4
    w4 = y.shape[1] // 4
    y4 = ((y.astype(jnp.int32)
           .reshape(h4, 4, w4, 4).sum(axis=(1, 3)) + 8) >> 4).astype(jnp.uint8)
    y4_pad = jnp.pad(y4, ((qpel.GUARD // 4, qpel.GUARD // 4),
                          (qpel.GUARD // 4, qpel.GUARD // 4)), mode="edge")

    return dict(y_pad=y_pad, u_pad=u_pad, v_pad=v_pad, y4_pad=y4_pad)
