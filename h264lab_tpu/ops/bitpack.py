"""Device-side variable-length bit packing: prefix-sum + non-overlapping
scatter-add.

The CAVLC stage emits per-block (value, nbits) symbol slots; this op packs
the whole frame's symbol stream into MSB-first uint32 words on device, so
only the packed payload (~0.5 MB for 1080p) crosses the host boundary
instead of the raw symbol arrays (~50 MB). Host-side NAL stitching then
merges the words after the (non-byte-aligned) slice header via the native
C++ packer.

Each symbol spans at most two 32-bit words; contributions from different
symbols never overlap bit-wise, so scatter-add assembles words exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("cap_words",))
def pack_bits_device(vals: jnp.ndarray, lens: jnp.ndarray, cap_words: int):
    """Pack flat symbol arrays into big-bit-endian uint32 words.

    Args:
      vals: (n,) uint32 symbol values (low `lens` bits significant).
      lens: (n,) int32 bit lengths (0 = empty slot, skipped).
      cap_words: static output capacity in 32-bit words.

    Returns (words (cap_words,) uint32, total_bits scalar int32).
    """
    vals = vals.astype(jnp.uint32)
    lens = lens.astype(jnp.int32)
    mask = (jnp.uint32(0xFFFFFFFF) >> (32 - jnp.clip(lens, 1, 32)).astype(jnp.uint32))
    vals = jnp.where(lens > 0, vals & mask, jnp.uint32(0))

    offs = jnp.cumsum(lens) - lens                 # exclusive prefix sum
    total_bits = jnp.sum(lens)
    w = (offs >> 5).astype(jnp.int32)
    s = (offs & 31).astype(jnp.int32)

    hb = lens + s - 32                             # bits spilling into w+1
    fits = hb <= 0
    sh_hi_l = jnp.clip(32 - s - lens, 0, 31).astype(jnp.uint32)
    sh_hi_r = jnp.clip(hb, 0, 31).astype(jnp.uint32)
    hi = jnp.where(fits, vals << sh_hi_l, vals >> sh_hi_r)
    sh_lo = jnp.clip(32 - hb, 1, 31).astype(jnp.uint32)
    lo = jnp.where(fits, jnp.uint32(0), vals << sh_lo)
    # drop empty slots by pointing them past the buffer
    w = jnp.where(lens > 0, w, cap_words)
    words = jnp.zeros((cap_words,), jnp.uint32)
    words = words.at[w].add(hi, mode="drop")
    words = words.at[w + 1].add(lo, mode="drop")
    return words, total_bits.astype(jnp.int32)


def words_to_bytes(words: np.ndarray, total_bits: int) -> bytes:
    """Convert packed uint32 words to the byte stream (MSB-first)."""
    nbytes = (int(total_bits) + 7) // 8
    return np.asarray(words).astype(">u4").tobytes()[:nbytes]


def bucket_words(total_bits: int) -> int:
    """Round word capacity up to a power-of-two bucket (bounds the number
    of distinct jit specializations of pack_bits_device)."""
    need = (int(total_bits) + 31) // 32 + 2
    cap = 1024
    while cap < need:
        cap *= 2
    return cap
