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

With `inter_layer_pred_flag=1`, I/IDR enhancement frames are coded in
**base mode** (inter-layer intra prediction, reference
`src/h264-lab.h:5754-5764`, `:6839-6844`): the base layer's deblocked
reconstruction is upsampled (ops/resample.py, the normative 4-tap /
bilinear filters) and every enhancement MB predicts from the co-located
upsampled block — `base_mode_flag=1` in the slice data, residual coded
inter-style (no prediction-mode syntax at all). P frames keep normal
inter coding but carry the scalable-extension slice-header tail and a
per-MB `base_mode_flag=0` bit, exactly like the reference's NAL-20
streams. Base-mode frames need no intra wavefront: prediction has no
neighbour dependency, so the whole frame encodes in one fully parallel
dispatch.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from h264lab_tpu.config import EncoderConfig, RunConfig
from h264lab_tpu.bitstream import BitWriter, headers
from h264lab_tpu.bitstream.nal import annexb_nal, split_annexb
from h264lab_tpu.models import mbscan, refstate, wavefront
from h264lab_tpu.models.encoder import H264Encoder, PIC_INIT_QP
from h264lab_tpu.ops import bitpack, cavlc, resample, tables
from h264lab_tpu.ops.tuning import INTER_DEADZONE_Q8

import jax
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


# ---------------------------------------------------------------------------
# Base-mode (inter-layer intra) frame encode — fully parallel
# ---------------------------------------------------------------------------

def _base_mode_frame_core(src_y, src_u, src_v, pred_y, pred_u, pred_v,
                          qp, qpc, mb_width: int, mb_height: int):
    """Encode one enhancement I/IDR frame where every MB is base-mode:
    prediction = co-located upsampled base-layer recon (G.8.6.2), residual
    inter-style TQ (reference QDQ_MODE_INTER at `src/h264-lab.h:4426`),
    syntax per MB = base_mode_flag(1) + CBP(inter map) + dQP + residual.
    All tiles (nmb, 16, 16)/(nmb, 8, 8) uint8. Returns sym grid + recon.
    """
    nmb = mb_width * mb_height
    ns = cavlc.N_SLOTS
    # zero_thr off: inter-layer intra residual is structured (upsampling
    # error), not noise — block kills cost real texture here
    lev, recon_y = mbscan._encode_inter_luma(src_y, pred_y, qp,
                                             zero_thr=False)
    cdc2, cac2, rec_uv = mbscan._encode_chroma(
        jnp.concatenate([src_u, src_v]),
        jnp.concatenate([pred_u, pred_v]), qpc, INTER_DEADZONE_Q8)
    cdc = jnp.stack([cdc2[:nmb], cdc2[nmb:]], axis=1)    # (nmb, 2, 2, 2)
    cac = jnp.stack([cac2[:nmb], cac2[nmb:]], axis=1)    # (nmb, 2, 2, 2, 4, 4)
    recon_u = rec_uv[:nmb]
    recon_v = rec_uv[nmb:]

    # ---- CBP ----
    nnz = jnp.sum(lev != 0, axis=(-2, -1))               # (nmb, 4, 4)
    grp = nnz.reshape(nmb, 2, 2, 2, 2).transpose(0, 1, 3, 2, 4)
    gnz = jnp.sum(grp, axis=(3, 4)) > 0
    cbp_luma = (gnz[:, 0, 0].astype(jnp.int32) + 2 * gnz[:, 0, 1]
                + 4 * gnz[:, 1, 0] + 8 * gnz[:, 1, 1])
    any_cac = jnp.sum(cac != 0, axis=(1, 2, 3, 4, 5)) > 0
    any_cdc = jnp.sum(cdc != 0, axis=(1, 2, 3)) > 0
    cbpc = jnp.where(any_cac, 2, jnp.where(any_cdc, 1, 0)).astype(jnp.int32)
    cbp = cbp_luma + (cbpc << 4)

    # ---- nC contexts (every MB coded; whole frame one slice) ----
    gw, gh = 4 * mb_width, 4 * mb_height
    lgrid = (nnz.reshape(mb_height, mb_width, 4, 4)
             .transpose(0, 2, 1, 3).reshape(gh, gw))
    bxg = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    byg = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    nc_grid = mbscan._block_nc(lgrid, gw, gh, bxg > 0, byg > 0)
    nc_luma = (nc_grid.reshape(mb_height, 4, mb_width, 4)
               .transpose(0, 2, 1, 3).reshape(nmb, 4, 4))

    cac_nnz = jnp.sum(cac != 0, axis=(-2, -1))           # (nmb, 2, 2, 2)
    cac_nnz = jnp.where((cbpc == 2)[:, None, None, None], cac_nnz, 0)
    cgw, cgh = 2 * mb_width, 2 * mb_height
    cbx = jax.lax.broadcasted_iota(jnp.int32, (cgh, cgw), 1)
    cby = jax.lax.broadcasted_iota(jnp.int32, (cgh, cgw), 0)
    ncc = []
    for p in range(2):
        cgrid = (cac_nnz[:, p].reshape(mb_height, mb_width, 2, 2)
                 .transpose(0, 2, 1, 3).reshape(cgh, cgw))
        g = mbscan._block_nc(cgrid, cgw, cgh, cbx > 0, cby > 0)
        ncc.append(g.reshape(mb_height, 2, mb_width, 2)
                   .transpose(0, 2, 1, 3).reshape(nmb, 2, 2))
    nc_chroma = jnp.stack(ncc, axis=1)

    # ---- CAVLC ----
    zz = jnp.asarray(tables.ZIGZAG_4x4)
    scan = lev.reshape(nmb * 16, 16)[:, zz]
    vv, ll, _ = cavlc.encode_blocks(scan, nc_luma.reshape(nmb * 16), 16)
    luma_vals = vv.reshape(nmb, 16, ns)
    ll = ll.reshape(nmb, 16, ns)
    bb = jnp.arange(16) // 4
    bc = jnp.arange(16) % 4
    grp_of_block = (bb // 2) * 2 + (bc // 2)
    bit = (cbp_luma[:, None] >> grp_of_block[None, :]) & 1
    luma_lens = jnp.where((bit > 0)[:, :, None], ll, 0)

    cdc_scan = jnp.pad(cdc.reshape(nmb * 2, 4), ((0, 0), (0, 12)))
    cdc_vals, cdc_lens, _ = cavlc.encode_blocks(
        cdc_scan, jnp.full((nmb * 2,), -1, jnp.int32), 4)
    cdc_vals = cdc_vals.reshape(nmb, 2, ns)
    cdc_lens = jnp.where((cbpc >= 1)[:, None, None],
                         cdc_lens.reshape(nmb, 2, ns), 0)

    cacf = jnp.pad(cac.reshape(nmb * 8, 16)[:, zz][:, 1:],
                   ((0, 0), (0, 1)))
    cac_vals, cac_lens, _ = cavlc.encode_blocks(
        cacf, nc_chroma.reshape(nmb * 8), 15)
    cac_vals = cac_vals.reshape(nmb, 8, ns)
    cac_lens = jnp.where((cbpc == 2)[:, None, None],
                         cac_lens.reshape(nmb, 8, ns), 0)

    # ---- header symbols: base_mode_flag, cbp, dqp ----
    cbp_code = jnp.asarray(tables.CBP_TO_CODENUM[:, 1])[jnp.clip(cbp, 0, 47)]
    cbpv, cbpl = mbscan._ue_codes(cbp_code)
    dqp_l = jnp.where(cbp != 0, 1, 0)                    # se(0) = '1'
    hdr_vals = jnp.concatenate([
        jnp.ones((nmb, 1), jnp.uint32),                  # base_mode_flag=1
        cbpv[:, None], jnp.ones((nmb, 1), jnp.uint32),
        jnp.zeros((nmb, ns - 3), jnp.uint32)], axis=1)
    hdr_lens = jnp.concatenate([
        jnp.ones((nmb, 1), jnp.int32),
        cbpl[:, None], dqp_l[:, None],
        jnp.zeros((nmb, ns - 3), jnp.int32)], axis=1)

    block_scan = jnp.asarray(tables.BLOCK_SCAN_4x4)
    sym_vals = jnp.concatenate([
        hdr_vals, luma_vals[:, block_scan].reshape(nmb, 16 * ns),
        cdc_vals.reshape(nmb, 2 * ns), cac_vals.reshape(nmb, 8 * ns)],
        axis=1)
    sym_lens = jnp.concatenate([
        hdr_lens, luma_lens[:, block_scan].reshape(nmb, 16 * ns),
        cdc_lens.reshape(nmb, 2 * ns), cac_lens.reshape(nmb, 8 * ns)],
        axis=1)

    # ---- deblock: base-mode MBs are intra (bS 4 on MB edges) ----
    rr = jnp.arange(nmb, dtype=jnp.int32) // mb_width
    cc = jnp.arange(nmb, dtype=jnp.int32) % mb_width
    df_y, df_u, df_v = mbscan.deblock_frame(
        recon_y, recon_u, recon_v,
        jnp.full((nmb,), mbscan.SEL_I16, jnp.int32), nnz,
        jnp.zeros((nmb, 4, 4), jnp.int32), jnp.zeros((nmb, 4, 4), jnp.int32),
        qp, qpc, rr > 0, cc > 0, mb_width, mb_height)

    return dict(sym_vals=sym_vals, sym_lens=sym_lens,
                total_bits=jnp.sum(sym_lens).astype(jnp.int32),
                recon_y=recon_y, recon_u=recon_u, recon_v=recon_v,
                df_y=df_y, df_u=df_u, df_v=df_v, cbp=cbp)


_base_mode_frame = jax.jit(
    _base_mode_frame_core, static_argnames=("mb_width", "mb_height"))


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
        self.ilp = config.inter_layer_pred_flag
        base_cfg = dataclasses.replace(
            config, width=config.width // 2, height=config.height // 2,
            num_layers=1, inter_layer_pred_flag=False,
            vbv_size_bytes=config.vbv_size_bytes // 4)
        self.base = H264Encoder(base_cfg)
        enh_cfg = dataclasses.replace(config, num_layers=1,
                                      inter_layer_pred_flag=False,
                                      sps_id=config.sps_id + 1)
        self.enh = H264Encoder(enh_cfg)
        # inter-layer prediction: enhancement slices carry scalable-ext
        # syntax (header tail + per-MB base_mode_flag)
        self.enh._svc_ext = self.ilp
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
                                    return_recon=return_recon or self.ilp)
        if self.ilp and base_res.frame_type in ("IDR", "I"):
            return self._encode_ilp_intra(y, u, v, run, base_res,
                                          return_recon)
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
                _scalable_ext_header(bw, is_idr, self.ilp)
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

    # ------------------------------------------------------------------
    def _encode_ilp_intra(self, y, u, v, run, base_res,
                          return_recon: bool) -> SvcFrameResult:
        """Enhancement I/IDR frame with inter-layer intra prediction:
        every MB base-mode from the upsampled base recon (reference
        `src/h264-lab.h:5754-5764`, upsampling drive `:6839-6844`)."""
        enh = self.enh
        cfg = enh.config
        run = run or RunConfig(qp_min=cfg.qp, qp_max=cfg.qp)
        is_idr = base_res.frame_type == "IDR"
        qp = enh.rc.frame_start(
            True, run.desired_frame_bytes,
            int(np.clip(run.qp_min, 10, 51)),
            int(np.clip(run.qp_max, 10, 51)))
        qpc = int(tables.QPC_FROM_QPY[qp])

        # upsample the base deblocked recon to enhancement resolution
        bry, bru, brv = base_res.recon
        uy = np.asarray(resample.upsample2x_luma(jnp.asarray(bry)))
        uu = np.asarray(resample.upsample2x_chroma(jnp.asarray(bru)))
        uv_ = np.asarray(resample.upsample2x_chroma(jnp.asarray(brv)))

        ph, pw = cfg.padded_height, cfg.padded_width
        tile = lambda p, t, h, w: wavefront.mb_tiles(
            wavefront.pad_plane(np.asarray(p, np.uint8), h, w), t)
        src_y = jnp.asarray(tile(y, 16, ph, pw))
        src_u = jnp.asarray(tile(u, 8, ph // 2, pw // 2))
        src_v = jnp.asarray(tile(v, 8, ph // 2, pw // 2))
        pred_y = jnp.asarray(tile(uy, 16, ph, pw))
        pred_u = jnp.asarray(tile(uu, 8, ph // 2, pw // 2))
        pred_v = jnp.asarray(tile(uv_, 8, ph // 2, pw // 2))

        out = _base_mode_frame(src_y, src_u, src_v,
                               pred_y, pred_u, pred_v,
                               jnp.int32(qp), jnp.int32(qpc),
                               cfg.mb_width, cfg.mb_height)

        # ---- slice NAL (type 20 with ILP header fields) ----
        if is_idr:
            enh.frame_num = 0
        shp = headers.SliceHeaderParams(
            slice_type=headers.SLICE_TYPE_I,
            is_idr=is_idr,
            frame_num=enh.frame_num,
            pps_id=enh._pps_id,
            idr_pic_id=enh.idr_pic_id,
            slice_qp=qp,
            pic_init_qp=PIC_INIT_QP,
            disable_deblocking_filter_idc=0,
            max_long_term_frames=cfg.max_long_term_reference_frames,
            svc_ilp=True)
        bw = BitWriter(capacity=1 << 16)
        headers.write_slice_header_rbsp(bw, shp)
        total_bits = int(out["total_bits"])
        cap = bitpack.bucket_words(total_bits)
        words, _ = bitpack.pack_frame_fast(out["sym_vals"],
                                           out["sym_lens"], cap)
        bw.append_bits_bytes(bitpack.words_to_bytes(words, total_bits),
                             total_bits)
        bw.rbsp_trailing_bits()
        ext = BitWriter()
        _scalable_ext_header(ext, is_idr, True)
        ref_idc = 3
        enh_out = b""
        if is_idr:
            enh_out += headers.sps_nal(enh._sps)
            enh_out += headers.pps_nal(cfg.sps_id, 0, PIC_INIT_QP)
        enh_out += annexb_nal(ref_idc, headers.NAL_SLICE_SCALABLE,
                              ext.to_bytes() + bw.to_bytes())

        # ---- enhancement stream state (mirrors H264Encoder bookkeeping)
        if is_idr:
            enh.idr_pic_id = (enh.idr_pic_id + 1) % 16
            enh._gop_pos = 1
            enh._refs = {}
            enh._short_term_used = False
            enh._lt_used = [False] * cfg.max_long_term_reference_frames
        else:
            enh._gop_pos += 1
        enh.frame_num = (enh.frame_num + 1) % (1 << headers.FRAME_NUM_BITS)
        enh.frames_encoded += 1
        state = refstate.prepare_reference(
            out["df_y"], out["df_u"], out["df_v"],
            cfg.mb_width, cfg.mb_height)
        enh._refs[0] = state
        enh._ref = state
        enh._most_recent_idx = 0
        enh._short_term_used = True
        enh._last_tiles = (out["df_y"], out["df_u"], out["df_v"])
        enh._last_frame_bytes = len(enh_out)
        enh.rc.frame_end(True, len(enh_out), run.desired_frame_bytes)

        # base layer: prefix NALs as in the rewrap path
        base_out = b""
        for nal in split_annexb(base_res.payload):
            ntype = nal[0] & 0x1F
            if ntype in (headers.NAL_SLICE, headers.NAL_IDR):
                base_out += _prefix_nal(is_idr)
            base_out += b"\x00\x00\x00\x01" + nal

        recon = None
        if return_recon:
            mbh, mbw = cfg.mb_height, cfg.mb_width
            ry = wavefront.tiles_to_plane(np.asarray(out["df_y"]), mbh, mbw)
            ru = wavefront.tiles_to_plane(np.asarray(out["df_u"]), mbh, mbw)
            rv = wavefront.tiles_to_plane(np.asarray(out["df_v"]), mbh, mbw)
            recon = (ry[:cfg.height, :cfg.width],
                     ru[:cfg.height // 2, :cfg.width // 2],
                     rv[:cfg.height // 2, :cfg.width // 2])
        return SvcFrameResult(
            payload=base_out + enh_out,
            base_payload=base_out,
            enh_payload=enh_out,
            frame_type=base_res.frame_type,
            recon=recon,
            base_recon=base_res.recon if return_recon else None)
