"""H264Encoder — the public encoder API.

Equivalent of the reference's `H264E_sizeof/init/encode` surface
(`src/h264-lab.h:264-312`, `:6654-6861`), re-shaped for JAX: encoder state
is a small pytree of device arrays plus host-side stream state; frames are
encoded by jit-compiled wavefront pipelines.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

from h264lab_tpu.config import EncoderConfig, RunConfig, FrameType
from h264lab_tpu.bitstream import BitWriter, headers
from h264lab_tpu.bitstream.nal import annexb_nal
from h264lab_tpu.models import mbscan, refstate, wavefront
from h264lab_tpu.ops import bitpack, denoise, tables
from h264lab_tpu.rc.ratecontrol import RateControl, filler_nal

PIC_INIT_QP = 26


@dataclasses.dataclass
class PendingFrame:
    """A dispatched-but-not-yet-packed frame (see encode_async)."""
    encoder: object
    run: object
    out: dict
    band_outs: list
    band_hdrs: list
    sps_pps: bytes
    qp: int
    is_intra: bool
    ft_name: str
    return_recon: bool
    # NALU-size enforcement (desired_nalu_bytes): original inputs plus a
    # pre-dispatch state snapshot so finish() can roll back and
    # re-encode the frame with more slices when a NALU overflows
    inputs: tuple = None
    rollback: dict = None


@dataclasses.dataclass
class FrameResult:
    payload: bytes                  # Annex-B bytes for this frame
    frame_type: str                 # "IDR" | "I" | "P"
    qp: int
    recon: tuple | None = None      # (y, u, v) deblocked recon if requested
    recon_unfiltered: tuple | None = None


class H264Encoder:
    """Stream-level encoder: IDR/I/P frames (Intra_16x16, Intra_4x4,
    inter 16x16/16x8/8x16/8x8 with quarter-pel ME), long-term reference
    policies, multi-slice bands, two-level rate control with VBV, and
    in-loop deblocking — the single-stream counterpart of the scale-out
    GopBandEncoder (h264lab_tpu.parallel.gop)."""

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
        # reference slots: 0 = short-term, 1..N = long-term (slot k holds
        # LongTermFrameIdx k-1); reference policy `src/h264-lab.h:6726-6754`
        self._refs = {}
        self._most_recent_idx = 0
        self._short_term_used = False
        self._lt_used = [False] * cfg.max_long_term_reference_frames
        self._last_tiles = None
        # previous P frame's full-pel MV field — an ME candidate centre
        # that extends reach beyond the coarse +-32 px (me.py); keyed by
        # band count so adaptive re-banding resets it
        self._prev_mv = None
        self._force_transparent = False
        self._last_frame_bytes = 0
        self._in_flight = 0          # dispatched-but-unfinished frames
        self._band_cache = {}
        self._denoise_prev = None   # previous denoised planes
        # set by SvcEncoder on its enhancement-layer encoder when
        # inter_layer_pred_flag is on: slices carry the scalable-ext
        # header tail and per-MB base_mode_flag bits (NAL 20 syntax)
        self._svc_ext = False
        self.rc = RateControl(cfg.n_mb, cfg.gop, cfg.vbv_size_bytes, cfg.qp)

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

    def _bands(self, run: RunConfig, force: int | None = None):
        """Slice bands as (first_mb_row, n_rows). Multi-slice comes from
        cfg.slice_bands, or adaptively from desired_nalu_bytes (reference
        `src/h264-lab.h:6418-6424` splits by NALU size): the initial
        count comes from the previous frame's size estimate, and
        `finish()` *enforces* the bound — an oversized slice NALU rolls
        the frame back and re-encodes it with more slices (`force`), so
        no emitted NALU exceeds the target even on a scene cut (unless
        a single MB row already exceeds it). The count is snapped to a
        divisor of mb_height so all bands are equal-height: equal bands
        dispatch as ONE vmapped computation (mbscan.encode_frame_banded)
        instead of a per-band loop; `force` snaps up so the slice count
        never decreases across re-encodes."""
        cfg = self.config
        if force is not None:
            n = max(1, min(force, cfg.mb_height))
            while cfg.mb_height % n:   # smallest divisor >= requested
                n += 1
        else:
            n = cfg.slice_bands
            nalu = run.desired_nalu_bytes or cfg.desired_nalu_bytes
            if nalu > 0 and self._last_frame_bytes:
                est = max(1, round(self._last_frame_bytes / nalu))
                n = max(n, min(est, cfg.mb_height))
            n = max(1, min(n, cfg.mb_height))
            while cfg.mb_height % n:   # largest divisor <= requested
                n -= 1
        rows = cfg.mb_height // n
        return [(i * rows, rows) for i in range(n)]

    def _band_arrays(self, rows: int, slope: int = 2):
        """Cached (steps, avail_top, avail_left) for a band height."""
        key = (rows, slope)
        if key not in self._band_cache:
            plan = wavefront.make_plan(self.config.mb_width, rows, slope)
            nmb = self.config.mb_width * rows
            r = np.arange(nmb) // self.config.mb_width
            c = np.arange(nmb) % self.config.mb_width
            self._band_cache[key] = (jnp.asarray(plan.steps),
                                     jnp.asarray(r > 0), jnp.asarray(c > 0))
        return self._band_cache[key]

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
        """Synchronous encode (dispatch + finish)."""
        return self.finish(self.encode_async(y, u, v, run, return_recon))

    def encode_async(self, y, u, v, run: RunConfig | None = None,
                     return_recon: bool = False,
                     _force_bands: int | None = None) -> "PendingFrame":
        """Dispatch the device computation for one frame and return
        immediately (JAX dispatch is asynchronous). Call `finish()` to
        pack the bitstream — overlapping the host-side packing of frame N
        with the device compute of frame N+1 (see bench.py). Note: in
        bitrate mode the RC feedback then lags by one frame, and with
        `desired_nalu_bytes` set an oversized NALU triggers a
        synchronous rollback + re-encode inside finish() — don't overlap
        dispatches in that mode."""
        cfg = self.config
        run = run or RunConfig(qp_min=cfg.qp, qp_max=cfg.qp)

        nalu_target = run.desired_nalu_bytes or cfg.desired_nalu_bytes
        rollback = None
        inputs = None
        if nalu_target > 0:
            inputs = (y, u, v)
            rollback = dict(
                frame_num=self.frame_num, idr_pic_id=self.idr_pic_id,
                frames_encoded=self.frames_encoded, gop_pos=self._gop_pos,
                refs=dict(self._refs), ref=self._ref,
                most_recent=self._most_recent_idx,
                short_term=self._short_term_used,
                lt_used=list(self._lt_used),
                last_tiles=self._last_tiles, prev_mv=self._prev_mv,
                denoise_prev=self._denoise_prev,
                force_transparent=self._force_transparent,
                last_frame_bytes=self._last_frame_bytes)

        ftype = self._frame_type(run)
        # long-term reference policy (reference `src/h264-lab.h:6734-6754`)
        n_lt = cfg.max_long_term_reference_frames
        if ftype == FrameType.I:
            lt_use, lt_update = -1, 0
        elif ftype == FrameType.KEY:
            lt_use, lt_update = -1, (1 if n_lt > 0 else 0)
        elif ftype == FrameType.GOLDEN:
            lt_use, lt_update = 1, 1
        elif ftype == FrameType.RECOVERY:
            lt_use, lt_update = 1, 0
        elif ftype == FrameType.DROPPABLE:
            lt_use, lt_update = self._most_recent_idx, -1
        elif ftype == FrameType.CUSTOM:
            lt_use = run.long_term_idx_use or self._most_recent_idx
            lt_update = run.long_term_idx_update
            if lt_use < 0:
                ftype = FrameType.KEY
                lt_update = 1 if n_lt > 0 else 0
        else:  # P
            lt_use, lt_update = self._most_recent_idx, 0
        if ftype not in (FrameType.KEY, FrameType.I) \
                and self._refs.get(max(lt_use, 0)) is None:
            ftype = FrameType.KEY          # no usable reference yet
            lt_use, lt_update = -1, (1 if n_lt > 0 else 0)
        is_idr = ftype == FrameType.KEY
        is_intra_frame = ftype in (FrameType.KEY, FrameType.I)

        # VBV overflow policy: replace this frame with an all-skip
        # "transparent" frame (reference `src/h264-lab.h:6497-6508`)
        if (self._force_transparent and not is_intra_frame
                and cfg.vbv_overflow_empty_frame_flag):
            self._force_transparent = False
            return self._encode_transparent(run, return_recon)

        qp = self.rc.frame_start(
            is_intra_frame, run.desired_frame_bytes,
            int(np.clip(run.qp_min, 10, 51)), int(np.clip(run.qp_max, 10, 51)))
        qpc = int(tables.QPC_FROM_QPY[qp])
        bands = self._bands(run, force=_force_bands)
        # fine (sub-frame) rate control: per-band QP offsets — the
        # parallel analog of the reference's `rc_mb_end` along-the-scan
        # correction (`src/h264-lab.h:6146-6179`); see rc.band_qp_offsets
        if cfg.fine_rate_control_flag and len(bands) > 1:
            band_qps = self.rc.band_qp_offsets(
                len(bands), is_intra_frame, run.desired_frame_bytes,
                int(np.clip(run.qp_min, 10, 51)),
                int(np.clip(run.qp_max, 10, 51)))
        else:
            band_qps = [qp] * len(bands)
        # MB-row-granular fine RC via mb_qp_delta (single slice, parallel
        # P path; reference `rc_mb_end` `src/h264-lab.h:6146-6179`)
        row_plan = None
        if (cfg.fine_rate_control_flag and len(bands) == 1
                and not is_intra_frame and run.encode_speed >= 2
                and run.desired_frame_bytes > 0):
            row_plan = self.rc.row_qp_offsets(
                cfg.mb_height, False, run.desired_frame_bytes,
                int(np.clip(run.qp_min, 10, 51)),
                int(np.clip(run.qp_max, 10, 51)))
            if all(q == row_plan[0] for q in row_plan):
                row_plan = None      # uniform plan: scalar-QP program
            else:
                band_qps = [row_plan[0]]     # slice_qp = first row's QP

        # temporal denoise pre-filter (reference gating: flag set and
        # speed < 2, `src/h264-lab.h:6684-6697`)
        if cfg.temporal_denoise_flag and run.encode_speed < 2:
            y = np.asarray(y, dtype=np.uint8)
            u = np.asarray(u, dtype=np.uint8)
            v = np.asarray(v, dtype=np.uint8)
            if self._denoise_prev is not None:
                py, pu, pv = self._denoise_prev
                y = np.asarray(denoise.denoise_plane_jit(y, py))
                u = np.asarray(denoise.denoise_plane_jit(u, pu))
                v = np.asarray(denoise.denoise_plane_jit(v, pv))
            self._denoise_prev = (y, u, v)

        ty, tu, tv = self._pad_tiles(y, u, v)
        enable_i4x4 = is_intra_frame or run.encode_speed < 2
        enable_partitions = run.encode_speed < 1
        # speed >= 9 stops ME at the full-pel winner (`src/h264-lab.h:5083`)
        enable_qpel = run.encode_speed < 9
        # reference speed presets disable deblock at speeds 8 and 10
        # (`src/h264-lab.h:6717`)
        enable_deblock = run.encode_speed not in (8, 10)
        # multi-slice: deblocking must not cross slice borders (idc 2,
        # reference multithread mode `src/h264-lab.h:4315-4323`)
        deblock_idc = (1 if not enable_deblock
                       else (2 if len(bands) > 1 else 0))

        payload = b""
        if is_idr:
            self.frame_num = 0
            payload += headers.sps_nal(self._sps)
            payload += headers.pps_nal(cfg.sps_id, 0, PIC_INIT_QP)

        mbw = cfg.mb_width
        band_outs = []
        band_hdrs = []
        n_bands = len(bands)
        rows = bands[0][1]
        # intra 4x4's top-right dependency needs slope-2 diagonals;
        # without it slope-1 halves the wavefront depth
        steps, a_top, a_left = self._band_arrays(
            rows, 2 if (enable_i4x4 or is_intra_frame) else 1)
        if n_bands == 1:
            if is_intra_frame:
                dummy = jnp.zeros((8, 8), jnp.uint8)
                out = mbscan.encode_frame_staged(
                    jnp.asarray(ty), jnp.asarray(tu), jnp.asarray(tv),
                    dummy, dummy, dummy, dummy,
                    jnp.int32(qp), jnp.int32(qpc),
                    steps, a_top, a_left,
                    mbw, rows, has_inter=False, enable_i4x4=True,
                    enable_deblock=enable_deblock)
            else:
                ref = self._refs[max(lt_use, 0)]
                # previous-frame MV candidate centre; zeros at GOP start
                # or on reference switches (keeps ONE compiled P program)
                if (lt_use == 0 and self._prev_mv is not None
                        and self._prev_mv[0] == 1):
                    prev = self._prev_mv[1:]
                else:
                    z = jnp.zeros((rows * mbw,), jnp.int32)
                    prev = (z, z)
                if row_plan is not None:
                    qp_arg = jnp.asarray(np.asarray(row_plan, np.int32))
                    qpc_arg = jnp.asarray(np.asarray(
                        [int(tables.QPC_FROM_QPY[q]) for q in row_plan],
                        np.int32))
                else:
                    qp_arg, qpc_arg = jnp.int32(qp), jnp.int32(qpc)
                out = mbscan.encode_frame_staged(
                    jnp.asarray(ty), jnp.asarray(tu), jnp.asarray(tv),
                    ref["y_pad"], ref["u_pad"], ref["v_pad"],
                    ref["y4_pad"],
                    qp_arg, qpc_arg,
                    steps, a_top, a_left,
                    mbw, rows, has_inter=True,
                    enable_i4x4=enable_i4x4, enable_deblock=enable_deblock,
                    enable_partitions=enable_partitions,
                    enable_qpel=enable_qpel,
                    svc_base_mode_bit=self._svc_ext,
                    mb_row_offset=jnp.int32(0),
                    prev_my=prev[0], prev_mx=prev[1])
            band_outs.append(out)
        else:
            # all bands in ONE vmapped dispatch (equal heights by _bands)
            nmb_b = rows * mbw
            by = jnp.asarray(ty).reshape(n_bands, nmb_b, 16, 16)
            bu = jnp.asarray(tu).reshape(n_bands, nmb_b, 8, 8)
            bv = jnp.asarray(tv).reshape(n_bands, nmb_b, 8, 8)
            row0s = jnp.asarray(
                np.arange(n_bands, dtype=np.int32) * rows)
            qp_arr = jnp.asarray(np.asarray(band_qps, np.int32))
            qpc_arr = jnp.asarray(np.asarray(
                [int(tables.QPC_FROM_QPY[q]) for q in band_qps], np.int32))
            if is_intra_frame:
                dummy = jnp.zeros((8, 8), jnp.uint8)
                bout = mbscan.encode_frame_banded_staged(
                    by, bu, bv, dummy, dummy, dummy, dummy,
                    qp_arr, qpc_arr,
                    steps, a_top, a_left, row0s,
                    mbw, rows, has_inter=False, enable_i4x4=True,
                    enable_deblock=enable_deblock)
            else:
                ref = self._refs[max(lt_use, 0)]
                if (lt_use == 0 and self._prev_mv is not None
                        and self._prev_mv[0] == n_bands):
                    prev = self._prev_mv[1:]
                else:
                    z = jnp.zeros((n_bands, nmb_b), jnp.int32)
                    prev = (z, z)
                bout = mbscan.encode_frame_banded_staged(
                    by, bu, bv,
                    ref["y_pad"], ref["u_pad"], ref["v_pad"],
                    ref["y4_pad"],
                    qp_arr, qpc_arr,
                    steps, a_top, a_left, row0s,
                    mbw, rows, has_inter=True,
                    enable_i4x4=enable_i4x4, enable_deblock=enable_deblock,
                    enable_partitions=enable_partitions,
                    enable_qpel=enable_qpel,
                    svc_base_mode_bit=self._svc_ext,
                    prev_my=prev[0], prev_mx=prev[1])
            band_outs = [{k: v[b] for k, v in bout.items()}
                         for b in range(n_bands)]

        # carry this frame's full-pel MV field as the next P frame's ME
        # candidate centre (device arrays; no sync)
        if is_intra_frame or lt_use != 0:
            self._prev_mv = None
        elif n_bands == 1:
            self._prev_mv = (1, band_outs[0]["mv_y"] >> 2,
                             band_outs[0]["mv_x"] >> 2)
        else:
            self._prev_mv = (n_bands, bout["mv_y"] >> 2, bout["mv_x"] >> 2)

        for bi, (row0, rows_b) in enumerate(bands):
            bw = BitWriter(capacity=1 << 16)
            shp = headers.SliceHeaderParams(
                slice_type=(headers.SLICE_TYPE_I if is_intra_frame
                            else headers.SLICE_TYPE_P),
                is_idr=is_idr,
                frame_num=self.frame_num,
                first_mb=row0 * mbw,
                pps_id=self._pps_id,
                idr_pic_id=self.idr_pic_id,
                slice_qp=band_qps[bi],
                pic_init_qp=PIC_INIT_QP,
                disable_deblocking_filter_idc=deblock_idc,
                long_term_idx_use=max(lt_use, 0) if not is_intra_frame else 0,
                long_term_idx_update=lt_update,
                short_term_used=self._short_term_used,
                lt_slot_in_use=(self._lt_used[lt_update - 1]
                                if lt_update > 0 else False),
                max_long_term_frames=n_lt,
                svc_ilp=self._svc_ext)
            headers.write_slice_header_rbsp(bw, shp)
            band_hdrs.append((bw, shp))

        if len(band_outs) == 1:
            out = band_outs[0]
        else:
            out = {k: bout[k].reshape((-1,) + bout[k].shape[2:])
                   for k in ("recon_y", "recon_u", "recon_v",
                             "df_y", "df_u", "df_v")}

        # stream state
        if is_idr:
            self.idr_pic_id = (self.idr_pic_id + 1) % 16
            self._gop_pos = 1
        else:
            self._gop_pos += 1
        self.frame_num = (self.frame_num + 1) % (1 << headers.FRAME_NUM_BITS)
        self.frames_encoded += 1

        # update the reference slot with the deblocked reconstruction
        # (device graphs only; nothing is synchronized here)
        if is_idr:
            self._refs = {}
            self._short_term_used = False
            self._lt_used = [False] * n_lt
        if lt_update >= 0:
            state = refstate.prepare_reference(
                out["df_y"], out["df_u"], out["df_v"],
                cfg.mb_width, cfg.mb_height)
            self._refs[lt_update] = state
            self._ref = state
            self._most_recent_idx = lt_update
            if lt_update == 0:
                self._short_term_used = True
            else:
                self._lt_used[lt_update - 1] = True
        self._last_tiles = (out["df_y"], out["df_u"], out["df_v"])

        ft_name = "IDR" if is_idr else ("I" if is_intra_frame else "P")
        self._in_flight += 1
        return PendingFrame(
            encoder=self, run=run, out=out, band_outs=band_outs,
            band_hdrs=band_hdrs, sps_pps=payload, qp=qp,
            is_intra=is_intra_frame, ft_name=ft_name,
            return_recon=return_recon, inputs=inputs, rollback=rollback)

    def finish(self, pending: "PendingFrame") -> FrameResult:
        """Pack the dispatched frame into Annex-B bytes (host side)."""
        if isinstance(pending, FrameResult):
            return pending      # transparent frames are produced directly
        self._in_flight -= 1
        cfg = self.config
        run = pending.run
        nals = []
        for out_b, (bw, shp) in zip(pending.band_outs, pending.band_hdrs):
            tail_len = int(out_b["tail_len"])
            mb_bits = int(out_b["total_bits"]) - tail_len
            cap = bitpack.bucket_words(mb_bits)
            words, _ = bitpack.pack_frame_fast(
                out_b["sym_vals"], out_b["sym_lens"], cap)
            bw.append_bits_bytes(bitpack.words_to_bytes(words, mb_bits),
                                 mb_bits)
            if tail_len:
                bw.u(tail_len, int(out_b["tail_val"]))
            bw.rbsp_trailing_bits()
            ref_idc, nal_type = headers.slice_nal_header_byte(shp)
            nals.append(annexb_nal(ref_idc, nal_type, bw.to_bytes()))
        band_bytes = [len(n) for n in nals]

        # NALU-size enforcement (reference on-the-fly split,
        # `src/h264-lab.h:6418-6424`): if any slice NALU overflows the
        # target, roll the stream state back and re-encode this frame
        # with more slices. Terminates: the slice count strictly grows
        # until one MB row per slice.
        nalu_target = run.desired_nalu_bytes or cfg.desired_nalu_bytes
        if (nalu_target > 0 and pending.rollback is not None
                and len(nals) < cfg.mb_height
                and max(band_bytes) > nalu_target):
            rb = pending.rollback
            self.frame_num = rb["frame_num"]
            self.idr_pic_id = rb["idr_pic_id"]
            self.frames_encoded = rb["frames_encoded"]
            self._gop_pos = rb["gop_pos"]
            self._refs = rb["refs"]
            self._ref = rb["ref"]
            self._most_recent_idx = rb["most_recent"]
            self._short_term_used = rb["short_term"]
            self._lt_used = rb["lt_used"]
            self._last_tiles = rb["last_tiles"]
            self._prev_mv = rb["prev_mv"]
            self._denoise_prev = rb["denoise_prev"]
            self._force_transparent = rb["force_transparent"]
            self._last_frame_bytes = rb["last_frame_bytes"]
            need = max(len(nals) + 1,
                       -(-sum(band_bytes) // max(nalu_target, 1)))
            y0, u0, v0 = pending.inputs
            return self.finish(self.encode_async(
                y0, u0, v0, run, pending.return_recon,
                _force_bands=need))

        payload = pending.sps_pps
        for nal in nals:
            payload += nal
            if run.nalu_callback:
                run.nalu_callback(nal, self.frames_encoded - 1)
        self._last_frame_bytes = len(payload)

        # rate control accounting + VBV actions (incl. the per-MB-row
        # bits that drive next frame's mb_qp_delta plan)
        self.rc.note_row_bits(np.concatenate(
            [np.asarray(b["row_bits"]) for b in pending.band_outs]))
        actions = self.rc.frame_end(pending.is_intra, len(payload),
                                    run.desired_frame_bytes,
                                    band_bytes=band_bytes)
        if actions["stuffing_bytes"] and cfg.vbv_underflow_stuffing_flag:
            payload += filler_nal(actions["stuffing_bytes"])
        if actions["overflow"]:
            self._force_transparent = True

        out = pending.out
        recon = None
        recon_unf = None
        if pending.return_recon:
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
        return FrameResult(payload=payload, frame_type=pending.ft_name,
                           qp=pending.qp, recon=recon,
                           recon_unfiltered=recon_unf)

    # ------------------------------------------------------------------
    # checkpoint / resume — the reference's entire state is two flat
    # relocatable arenas (SURVEY.md §5.4); here it is a host-serializable
    # dict: stream counters + RC state + reference pictures.
    def get_state(self) -> dict:
        """Snapshot of all mutable encoder state. Host numpy arrays only,
        so the result pickles and survives process restarts. Must not be
        called between encode_async() and finish(): stream counters are
        already advanced but RC/VBV feedback is not, so a resumed stream
        would diverge in bitrate/adaptive modes."""
        if self._in_flight:
            raise RuntimeError(
                "get_state() with a frame in flight: call finish() on the "
                "pending frame first")
        refs = {k: {n: np.asarray(a) for n, a in st.items()}
                for k, st in self._refs.items()}
        return {
            "frame_num": self.frame_num,
            "idr_pic_id": self.idr_pic_id,
            "frames_encoded": self.frames_encoded,
            "gop_pos": self._gop_pos,
            "most_recent_idx": self._most_recent_idx,
            "short_term_used": self._short_term_used,
            "lt_used": list(self._lt_used),
            "force_transparent": self._force_transparent,
            "last_frame_bytes": self._last_frame_bytes,
            "refs": refs,
            "last_tiles": (None if self._last_tiles is None else
                           tuple(np.asarray(t) for t in self._last_tiles)),
            "prev_mv": (None if self._prev_mv is None else
                        (self._prev_mv[0], np.asarray(self._prev_mv[1]),
                         np.asarray(self._prev_mv[2]))),
            "denoise_prev": (None if self._denoise_prev is None else
                             tuple(np.asarray(p) for p in self._denoise_prev)),
            "rc": self.rc.get_state(),
        }

    def set_state(self, st: dict):
        """Restore a snapshot taken by get_state() on a same-config
        encoder; the stream continues bit-compatibly from that point."""
        self.frame_num = st["frame_num"]
        self.idr_pic_id = st["idr_pic_id"]
        self.frames_encoded = st["frames_encoded"]
        self._gop_pos = st["gop_pos"]
        self._most_recent_idx = st["most_recent_idx"]
        self._short_term_used = st["short_term_used"]
        self._lt_used = list(st["lt_used"])
        self._force_transparent = st["force_transparent"]
        self._last_frame_bytes = st["last_frame_bytes"]
        self._refs = {k: {n: jnp.asarray(a) for n, a in s.items()}
                      for k, s in st["refs"].items()}
        self._ref = (self._refs.get(self._most_recent_idx)
                     if self._refs else None)
        lt = st.get("last_tiles")
        self._last_tiles = (None if lt is None
                            else tuple(jnp.asarray(t) for t in lt))
        pm = st.get("prev_mv")
        self._prev_mv = (None if pm is None else
                         (pm[0], jnp.asarray(pm[1]), jnp.asarray(pm[2])))
        self._denoise_prev = st["denoise_prev"]
        self.rc.set_state(st["rc"])

    # ------------------------------------------------------------------
    def _encode_transparent(self, run: RunConfig,
                            return_recon: bool) -> FrameResult:
        """All-skip P frame: every MB P_Skip with a zero predictor chain,
        so the reconstruction equals the reference picture exactly."""
        cfg = self.config
        bw = BitWriter()
        shp = headers.SliceHeaderParams(
            slice_type=headers.SLICE_TYPE_P,
            is_idr=False,
            frame_num=self.frame_num,
            pps_id=self._pps_id,
            slice_qp=self.rc.qp,
            pic_init_qp=PIC_INIT_QP,
            disable_deblocking_filter_idc=1,
            long_term_idx_update=0,
            max_long_term_frames=cfg.max_long_term_reference_frames)
        headers.write_slice_header_rbsp(bw, shp)
        bw.ue(cfg.n_mb)          # mb_skip_run covering the whole picture
        bw.rbsp_trailing_bits()
        ref_idc, nal_type = headers.slice_nal_header_byte(shp)
        payload = annexb_nal(ref_idc, nal_type, bw.to_bytes())
        self.frame_num = (self.frame_num + 1) % (1 << headers.FRAME_NUM_BITS)
        self._gop_pos += 1
        self.frames_encoded += 1
        self.rc.frame_end(False, len(payload), run.desired_frame_bytes)
        recon = None
        if return_recon and self._last_tiles is not None:
            cfgw, cfgh = cfg.mb_width, cfg.mb_height
            ry = wavefront.tiles_to_plane(np.asarray(self._last_tiles[0]), cfgh, cfgw)
            ru = wavefront.tiles_to_plane(np.asarray(self._last_tiles[1]), cfgh, cfgw)
            rv = wavefront.tiles_to_plane(np.asarray(self._last_tiles[2]), cfgh, cfgw)
            recon = (ry[:cfg.height, :cfg.width],
                     ru[:cfg.height // 2, :cfg.width // 2],
                     rv[:cfg.height // 2, :cfg.width // 2])
        return FrameResult(payload=payload, frame_type="P", qp=self.rc.qp,
                           recon=recon)
