"""h264lab_tpu — a TPU-native H.264/AVC baseline-profile encoder framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
encoder (`/root/reference`, a C single-header H.264 baseline encoder):

- Baseline-profile (I/P slices, CAVLC) Annex-B bitstreams, IDR/I/P/Golden/
  Recovery/Droppable frame types via long-term references.
- Intra 16x16 + 4x4 prediction, inter 16x16/16x8/8x16/8x8 with full-pel +
  sub-pel motion search, 4x4 integer transform + quantization, in-loop
  deblocking, two-level rate control with a VBV model, temporal denoising,
  multi-slice output and SVC 2-layer spatial scalability.

Architecture (TPU-first, not a port):

- Pixel math is batched over macroblocks as `(n_mb, 16, 16)` tensors and
  runs as fused XLA ops on VMEM tiles; the per-MB scan of the C encoder
  becomes an anti-diagonal *wavefront* `lax.scan`. One Pallas kernel ships
  (the bit-pack stitch, `ops/bitpack.py:pack_frame_pallas`) — the XLA path
  is the default because this environment's tunneled TPU cannot execute
  Pallas programs.
- CAVLC symbols are computed for every 4x4 block in parallel on device;
  variable-length bit packing is a prefix-sum pass; NAL framing and
  emulation-prevention escaping run on host (native C++ fast path).
- Scale-out: `jax.sharding.Mesh` with axes `("gop", "band")` — frames/GOPs
  data-parallel across hosts, MB-row slice bands across chips (each band is
  an independent H.264 slice, mirroring the reference's slice-parallel
  threading mode at `src/h264-lab.h:6511-6574`).
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache, shared by every entry point (CLI,
# bench, tests): wavefront-scan programs at 1080p compile in minutes, so
# a warm on-disk cache is the difference between a ~7-minute and a
# ~10-second cold start. Opt out with H264LAB_NO_COMPILE_CACHE=1.
if not _os.environ.get("H264LAB_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "H264LAB_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      _os.pardir, ".jax_cache"))
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from h264lab_tpu.config import (
    EncoderConfig,
    RunConfig,
    FrameType,
    SpeedPreset,
)
from h264lab_tpu.models.encoder import H264Encoder

__version__ = "0.1.0"

__all__ = [
    "EncoderConfig",
    "RunConfig",
    "FrameType",
    "SpeedPreset",
    "H264Encoder",
    "__version__",
]
