"""Device-mesh scale-out: GOP/frame data parallelism × slice-band
parallelism.

This is the TPU-native replacement for the reference's two parallelism
mechanisms (SURVEY.md §2.2): the slice-parallel thread fan-out
(`src/h264-lab.h:6511-6574`) becomes the "band" mesh axis — each band is
an independent H.264 slice with its own wavefront, entropy context and
output NALU, exactly like the reference's per-thread slice bands — and
frame/GOP-level parallelism across hosts becomes the "gop" axis.

Because bands and frames are *independent* slices, the whole batch is pure
SPMD data parallelism: a (n_gop, n_band, ...) leading batch sharded over
the mesh with zero cross-device collectives inside a step (the
embarrassingly-parallel decomposition the reference itself uses for
threads). Cooperating-band mode (halo exchange via collectives for
single-slice frames) is the planned extension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from h264lab_tpu.models import mbscan, wavefront


def make_mesh(n_gop: int, n_band: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert n_gop * n_band <= len(devices), (
        f"mesh {n_gop}x{n_band} needs {n_gop * n_band} devices, "
        f"have {len(devices)}")
    dev = np.array(devices[:n_gop * n_band]).reshape(n_gop, n_band)
    return Mesh(dev, axis_names=("gop", "band"))


def _batched_core(src_y, src_u, src_v, qp, qpc, steps, avail_top, avail_left,
                  mb_width: int, mb_height: int):
    """vmap the per-slice intra core over (gop, band) batch axes."""
    f = functools.partial(mbscan.encode_intra_core,
                          mb_width=mb_width, mb_height=mb_height)
    over_band = jax.vmap(f, in_axes=(0, 0, 0, None, None, None, None, None))
    over_gop = jax.vmap(over_band,
                       in_axes=(0, 0, 0, None, None, None, None, None))
    return over_gop(src_y, src_u, src_v, qp, qpc, steps,
                    avail_top, avail_left)


_sharded_encode = jax.jit(
    _batched_core, static_argnames=("mb_width", "mb_height"))


class ShardedIntraEncoder:
    """Encodes batches of (frames × slice-bands) over a device mesh.

    Each band covers `band_mb_rows` MB rows and is emitted as an
    independent slice; per-band outputs are stitched in order on host
    (mirroring the ordered concat at `src/h264-lab.h:6563-6567`).
    """

    def __init__(self, mesh: Mesh, mb_width: int, band_mb_rows: int):
        self.mesh = mesh
        self.mb_width = mb_width
        self.band_mb_rows = band_mb_rows
        plan = wavefront.make_plan(mb_width, band_mb_rows, slope=2)
        self._steps = jnp.asarray(plan.steps)
        nmb = mb_width * band_mb_rows
        r = np.arange(nmb) // mb_width
        c = np.arange(nmb) % mb_width
        # top rows of a band have no intra neighbors (slice boundary)
        self._avail_top = jnp.asarray(r > 0)
        self._avail_left = jnp.asarray(c > 0)

    def encode_batch(self, tiles_y, tiles_u, tiles_v, qp: int, qpc: int):
        """tiles_*: (n_gop, n_band, nmb_band, 16, 16)/(.., 8, 8) uint8.

        Returns the dict of batched outputs (leading (n_gop, n_band))."""
        spec = P("gop", "band")
        sharding = NamedSharding(self.mesh, spec)
        ty = jax.device_put(jnp.asarray(tiles_y), sharding)
        tu = jax.device_put(jnp.asarray(tiles_u), sharding)
        tv = jax.device_put(jnp.asarray(tiles_v), sharding)
        out = _sharded_encode(
            ty, tu, tv, jnp.int32(qp), jnp.int32(qpc),
            self._steps, self._avail_top, self._avail_left,
            mb_width=self.mb_width, mb_height=self.band_mb_rows)
        return out
