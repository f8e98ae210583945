"""H264Encoder — the public encoder API.

Equivalent of the reference's `H264E_sizeof/init/encode` surface
(`src/h264-lab.h:264-312`), re-shaped for JAX: state is a pytree, frames
are encoded by jit-compiled pipelines from `h264lab_tpu.models`.
"""

from __future__ import annotations

from h264lab_tpu.config import EncoderConfig, RunConfig


class H264Encoder:
    """Stream-level encoder object. Placeholder until the intra pipeline
    lands; the full implementation arrives with models/intra.py."""

    def __init__(self, config: EncoderConfig):
        self.config = config
        self.frame_num = 0
        self.idr_pic_id = 0

    def encode(self, y, u, v, run: RunConfig | None = None) -> bytes:
        raise NotImplementedError("encoder pipeline under construction")
