"""H264Encoder — the public encoder API.

Equivalent of the reference's `H264E_sizeof/init/encode` surface
(`src/h264-lab.h:264-312`, `:6654-6861`), re-shaped for JAX: encoder state
is a small pytree of device arrays plus host-side stream state; frames are
encoded by jit-compiled wavefront pipelines.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from h264lab_tpu.config import EncoderConfig, RunConfig, FrameType
from h264lab_tpu.bitstream import BitWriter, headers
from h264lab_tpu.bitstream.nal import annexb_nal
from h264lab_tpu.models import mbscan, refstate, wavefront
from h264lab_tpu.ops import bitpack, tables

PIC_INIT_QP = 26


@dataclasses.dataclass
class FrameResult:
    payload: bytes                  # Annex-B bytes for this frame
    frame_type: str                 # "IDR" | "I" | "P"
    qp: int
    recon: tuple | None = None      # (y, u, v) deblocked recon if requested
    recon_unfiltered: tuple | None = None


class H264Encoder:
    """Stream-level encoder. v1 capability: all-intra (I/IDR) frames with
    Intra_16x16 + chroma prediction and CAVLC; P frames and the full GOP
    machinery land next."""

    def __init__(self, config: EncoderConfig):
        self.config = config
        cfg = config
        # slope-2 wavefront satisfies intra-4x4's top-right dependency
        self.plan = wavefront.make_plan(cfg.mb_width, cfg.mb_height, slope=2)
        self._steps = jnp.asarray(self.plan.steps)
        nmb = cfg.n_mb
        mbw = cfg.mb_width
        r = np.arange(nmb) // mbw
        c = np.arange(nmb) % mbw
        self._avail_top = jnp.asarray(r > 0)
        self._avail_left = jnp.asarray(c > 0)

        self.frame_num = 0
        self.idr_pic_id = 0
        self.frames_encoded = 0
        self._gop_pos = 0
        self._ref = None      # reference-state pytree (refstate.py)

        self._sps = headers.SpsParams(
            width=cfg.width, height=cfg.height,
            mb_width=cfg.mb_width, mb_height=cfg.mb_height,
            sps_id=cfg.sps_id,
            num_ref_frames=1 + cfg.max_long_term_reference_frames,
            vbv_size_bytes=cfg.vbv_size_bytes)
        self._pps_id = cfg.sps_id * 4

    # ------------------------------------------------------------------
    def _frame_type(self, run: RunConfig) -> FrameType:
        if run.frame_type != FrameType.DEFAULT:
            return run.frame_type
        gop = self.config.gop
        if self.frames_encoded == 0 or self._ref is None:
            return FrameType.KEY
        if gop and self._gop_pos >= gop:
            return FrameType.KEY
        return FrameType.P

    def _pad_tiles(self, y, u, v):
        cfg = self.config
        ph, pw = cfg.padded_height, cfg.padded_width
        y = wavefront.pad_plane(np.asarray(y, dtype=np.uint8), ph, pw)
        u = wavefront.pad_plane(np.asarray(u, dtype=np.uint8), ph // 2, pw // 2)
        v = wavefront.pad_plane(np.asarray(v, dtype=np.uint8), ph // 2, pw // 2)
        return (wavefront.mb_tiles(y, 16),
                wavefront.mb_tiles(u, 8),
                wavefront.mb_tiles(v, 8))

    # ------------------------------------------------------------------
    def encode(self, y, u, v, run: RunConfig | None = None,
               return_recon: bool = False) -> FrameResult:
        cfg = self.config
        run = run or RunConfig(qp_min=cfg.qp, qp_max=cfg.qp)
        qp = int(np.clip(run.qp_max, 10, 51))
        qpc = int(tables.QPC_FROM_QPY[qp])

        ftype = self._frame_type(run)
        is_idr = ftype == FrameType.KEY
        is_intra_frame = ftype in (FrameType.KEY, FrameType.I)

        ty, tu, tv = self._pad_tiles(y, u, v)
        enable_i4x4 = is_intra_frame or run.encode_speed < 2
        # reference speed presets disable deblock at speeds 8 and 10
        # (`src/h264-lab.h:6717`)
        enable_deblock = run.encode_speed not in (8, 10)
        if is_intra_frame:
            out = mbscan.encode_intra_frame(
                jnp.asarray(ty), jnp.asarray(tu), jnp.asarray(tv),
                jnp.int32(qp), jnp.int32(qpc),
                self._steps, self._avail_top, self._avail_left,
                cfg.mb_width, cfg.mb_height, enable_i4x4=True,
                enable_deblock=enable_deblock)
        else:
            ref = self._ref
            out = mbscan.encode_frame(
                jnp.asarray(ty), jnp.asarray(tu), jnp.asarray(tv),
                ref["y_pad"], ref["u_pad"], ref["v_pad"],
                ref["b"], ref["h"], ref["j"], ref["y4_pad"],
                jnp.int32(qp), jnp.int32(qpc),
                self._steps, self._avail_top, self._avail_left,
                cfg.mb_width, cfg.mb_height, has_inter=True,
                enable_i4x4=enable_i4x4, enable_deblock=enable_deblock)

        payload = b""
        if is_idr:
            self.frame_num = 0
            payload += headers.sps_nal(self._sps)
            payload += headers.pps_nal(cfg.sps_id, 0, PIC_INIT_QP)

        # slice
        bw = BitWriter(capacity=1 << 16)
        shp = headers.SliceHeaderParams(
            slice_type=(headers.SLICE_TYPE_I if is_intra_frame
                        else headers.SLICE_TYPE_P),
            is_idr=is_idr,
            frame_num=self.frame_num,
            pps_id=self._pps_id,
            idr_pic_id=self.idr_pic_id,
            slice_qp=qp,
            pic_init_qp=PIC_INIT_QP,
            disable_deblocking_filter_idc=0 if enable_deblock else 1,
            long_term_idx_update=0,
            max_long_term_frames=cfg.max_long_term_reference_frames)
        headers.write_slice_header_rbsp(bw, shp)
        # device-packed CAVLC payload; host only stitches the words after
        # the (non-byte-aligned) slice header
        total_bits = int(out["total_bits"])
        cap = bitpack.bucket_words(total_bits)
        words, _ = bitpack.pack_bits_device(out["sym_vals"],
                                            out["sym_lens"], cap)
        bw.append_bits_bytes(bitpack.words_to_bytes(words, total_bits),
                             total_bits)
        bw.rbsp_trailing_bits()
        ref_idc, nal_type = headers.slice_nal_header_byte(shp)
        nal = annexb_nal(ref_idc, nal_type, bw.to_bytes())
        payload += nal
        if run.nalu_callback:
            run.nalu_callback(nal, self.frames_encoded)

        # stream state
        if is_idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 16
            self._gop_pos = 1
        else:
            self._gop_pos += 1
        self.frame_num = (self.frame_num + 1) % (1 << headers.FRAME_NUM_BITS)
        self.frames_encoded += 1

        # update the short-term reference with the deblocked reconstruction
        self._ref = refstate.prepare_reference(
            out["df_y"], out["df_u"], out["df_v"],
            cfg.mb_width, cfg.mb_height)

        recon = None
        if return_recon:
            cfgw, cfgh = cfg.mb_width, cfg.mb_height
            ry = wavefront.tiles_to_plane(np.asarray(out["df_y"]), cfgh, cfgw)
            ru = wavefront.tiles_to_plane(np.asarray(out["df_u"]), cfgh, cfgw)
            rv = wavefront.tiles_to_plane(np.asarray(out["df_v"]), cfgh, cfgw)
            recon = (ry[:cfg.height, :cfg.width],
                     ru[:cfg.height // 2, :cfg.width // 2],
                     rv[:cfg.height // 2, :cfg.width // 2])
            uy = wavefront.tiles_to_plane(np.asarray(out["recon_y"]), cfgh, cfgw)
            uu = wavefront.tiles_to_plane(np.asarray(out["recon_u"]), cfgh, cfgw)
            uv = wavefront.tiles_to_plane(np.asarray(out["recon_v"]), cfgh, cfgw)
            recon_unf = (uy[:cfg.height, :cfg.width],
                         uu[:cfg.height // 2, :cfg.width // 2],
                         uv[:cfg.height // 2, :cfg.width // 2])
        ft_name = "IDR" if is_idr else ("I" if is_intra_frame else "P")
        return FrameResult(payload=payload, frame_type=ft_name,
                           qp=qp, recon=recon,
                           recon_unfiltered=recon_unf if return_recon else None)
