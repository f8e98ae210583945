"""Temporal denoising pre-filter.

Reference equivalent: `h264e_denoise_run` (`src/h264-lab.h:1547-1620`) —
a recursive per-pixel blend of the current frame toward the previous
*denoised* frame, with a blend gain that decays with the local temporal
difference (strong smoothing for small, noise-like differences; none for
large, motion-like ones). The gain curve here is our own fit with the
same shape as the reference's `g_diff_to_gainQ8` LUT; the reference marks
its tables ADJUSTABLE tuning data (`src/h264-lab.h:787-790`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# gain LUT in Q8 indexed by |diff| (0..31, clamped): ~0.75 blend at diff 0
# decaying to 0 by diff ~12
GAIN_Q8 = np.clip(192 - np.arange(32) * 16, 0, 255).astype(np.int32)


def denoise_plane(cur: jnp.ndarray, prev: jnp.ndarray) -> jnp.ndarray:
    """One recursive denoise step: returns the denoised current plane.

    cur/prev: (H, W) uint8; prev is the previous *denoised* frame.
    """
    c = cur.astype(jnp.int32)
    p = prev.astype(jnp.int32)
    d = c - p
    ad = jnp.abs(d)
    # neighbourhood activity: average of 4-neighbour abs diffs; high
    # activity (real motion/texture change) suppresses the blend
    pad = jnp.pad(ad, 1, mode="edge")
    act = (pad[:-2, 1:-1] + pad[2:, 1:-1]
           + pad[1:-1, :-2] + pad[1:-1, 2:] + 2) >> 2
    idx = jnp.clip(jnp.maximum(ad, act), 0, 31)
    gain = jnp.asarray(GAIN_Q8)[idx]
    out = c - ((d * gain) >> 8)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


denoise_plane_jit = jax.jit(denoise_plane)
