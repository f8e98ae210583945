"""SVC Scalable-Baseline two-layer spatial scalability.

Reference equivalents: chained per-layer encoders (`H264E_init`
`src/h264-lab.h:6375-6407`), base-layer drive + prefix NALs + scalable
extension slice headers (`:6813-6851`, `:4192-4242`).

Layout matches the reference driver's default configuration
(`src/minih264e_test.c:508-511`: num_layers=2, inter_layer_pred_flag=0):

- base layer: half-resolution AVC-compatible stream — SPS (profile 66),
  PPS, and each slice preceded by a prefix NAL (type 14) carrying the
  SVC extension header;
- enhancement layer: full-resolution slices in NAL type 20 with the
  scalable extension header (dependency_id 1), subset SPS (profile 83)
  and its own PPS. With inter_layer_pred_flag=0 the enhancement MB layer
  is plain baseline coding, exactly as the reference emits it.

The inter-layer intra upsampling ops (ops/resample.py) provide the
prediction path for inter_layer_pred_flag=1 (base-mode MBs), which is not
yet wired into the MB engine.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from h264lab_tpu.config import EncoderConfig, RunConfig
from h264lab_tpu.bitstream import BitWriter, headers
from h264lab_tpu.bitstream.nal import annexb_nal, split_annexb
from h264lab_tpu.models.encoder import H264Encoder
from h264lab_tpu.ops import resample

import jax.numpy as jnp


def _prefix_nal(is_idr: bool) -> bytes:
    """Prefix NAL unit (type 14) announcing the base layer to SVC decoders
    (reference `src/h264-lab.h:4196-4231`)."""
    bw = BitWriter()
    bw.u(8, (1 << 7) | (int(is_idr) << 6))   # reserved_one | idr | priority
    bw.u1(1)       # no_inter_layer_pred_flag
    bw.u(3, 0)     # dependency_id
    bw.u(4, 0)     # quality_id
    bw.u(3, 0)     # temporal_id
    bw.u1(1)       # use_ref_base_pic_flag
    bw.u1(0)       # discardable_flag
    bw.u1(1)       # output_flag
    bw.u(2, 3)     # reserved_three_2bits
    bw.u1(0)       # store_ref_base_pic_flag
    if not is_idr:
        bw.u1(0)   # adaptive_ref_base_pic_marking_mode_flag
    bw.u1(0)       # additional_prefix_nal_unit_extension_flag
    bw.rbsp_trailing_bits()
    return annexb_nal(2, headers.NAL_PREFIX, bw.to_bytes())


def _scalable_ext_header(bw: BitWriter, is_idr: bool,
                         inter_layer_pred: bool):
    """nal_unit_header_svc_extension for enhancement slices (NAL 20)."""
    bw.u(8, (1 << 7) | (int(is_idr) << 6))
    bw.u1(0 if inter_layer_pred else 1)   # no_inter_layer_pred_flag
    bw.u(3, 1)     # dependency_id
    bw.u(4, 0)     # quality_id
    bw.u(3, 0)     # temporal_id
    bw.u1(0)       # use_ref_base_pic_flag
    bw.u1(1)       # discardable_flag
    bw.u1(1)       # output_flag
    bw.u(2, 3)


@dataclasses.dataclass
class SvcFrameResult:
    payload: bytes
    base_payload: bytes
    enh_payload: bytes
    frame_type: str
    recon: tuple | None = None       # enhancement-layer recon
    base_recon: tuple | None = None


class SvcEncoder:
    """Two-layer spatial-scalable encoder (Scalable Baseline)."""

    def __init__(self, config: EncoderConfig):
        assert config.num_layers == 2
        self.config = config
        base_cfg = dataclasses.replace(
            config, width=config.width // 2, height=config.height // 2,
            num_layers=1,
            vbv_size_bytes=config.vbv_size_bytes // 4)
        self.base = H264Encoder(base_cfg)
        enh_cfg = dataclasses.replace(config, num_layers=1,
                                      sps_id=config.sps_id + 1)
        self.enh = H264Encoder(enh_cfg)
        # enhancement SPS must be a subset SPS (profile 83)
        self.enh._sps = dataclasses.replace(
            self.enh._sps, profile_idc=headers.PROFILE_SCALABLE_BASELINE)

    def encode(self, y, u, v, run: RunConfig | None = None,
               return_recon: bool = False) -> SvcFrameResult:
        y = np.asarray(y, dtype=np.uint8)
        u = np.asarray(u, dtype=np.uint8)
        v = np.asarray(v, dtype=np.uint8)
        # base layer input: 2x downsampled (reference downsampler)
        by = np.asarray(resample.downsample2x(jnp.asarray(y)))
        bu = np.asarray(resample.downsample2x(jnp.asarray(u)))
        bv = np.asarray(resample.downsample2x(jnp.asarray(v)))

        base_res = self.base.encode(by, bu, bv, run,
                                    return_recon=return_recon)
        enh_res = self.enh.encode(y, u, v, run, return_recon=return_recon)

        is_idr = base_res.frame_type == "IDR"
        # base layer: insert a prefix NAL before each slice NAL
        base_out = b""
        for nal in split_annexb(base_res.payload):
            ntype = nal[0] & 0x1F
            if ntype in (headers.NAL_SLICE, headers.NAL_IDR):
                base_out += _prefix_nal(is_idr)
            base_out += b"\x00\x00\x00\x01" + nal

        # enhancement layer: rewrap slice NALs as NAL 20 with the
        # scalable extension header
        enh_out = b""
        for nal in split_annexb(enh_res.payload):
            ntype = nal[0] & 0x1F
            ref_idc = nal[0] >> 5
            if ntype in (headers.NAL_SLICE, headers.NAL_IDR):
                bw = BitWriter()
                _scalable_ext_header(bw, is_idr, False)
                ext = bw.to_bytes()
                enh_out += (b"\x00\x00\x00\x01"
                            + bytes([(ref_idc << 5) |
                                     headers.NAL_SLICE_SCALABLE])
                            + ext + nal[1:])
            else:
                enh_out += b"\x00\x00\x00\x01" + nal

        return SvcFrameResult(
            payload=base_out + enh_out,
            base_payload=base_out,
            enh_payload=enh_out,
            frame_type=base_res.frame_type,
            recon=enh_res.recon,
            base_recon=base_res.recon)
