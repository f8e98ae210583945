"""Two-level rate control with a VBV buffer model.

Re-implementation of the reference's frame-level RC capability surface
(`rc_frame_start` `src/h264-lab.h:5924-6070`, `rc_frame_end` `:6075-6141`):

- per-frame QP chosen from a bits-per-MB model plus VBV-drift feedback
- qp_min/qp_max clamping from the run params
- VBV fullness tracking with the reference's two policies:
  overflow -> "transparent" all-skip frame, underflow -> filler NALUs

The bits model is an exponential fit (bits halve every 6 QP steps, the
H.264 quantizer-step doubling law) with separate I/P gains, adapted
online from actual frame sizes — the same feedback structure as the
reference's LUT + dqp adaptation, re-fitted rather than transcribed.
"""

from __future__ import annotations

import dataclasses
import math


def _model_bits_per_mb(qp: int, is_intra: bool) -> float:
    """A-priori bits/MB estimate at a given QP."""
    base = 1400.0 if is_intra else 700.0   # bits per MB at QP 10
    return base * 2.0 ** ((10 - qp) / 6.0)


@dataclasses.dataclass
class VbvState:
    size_bits: int = 0          # 0 = VBV disabled
    fullness: float = 0.0       # bits currently in the buffer

    def configured(self) -> bool:
        return self.size_bits > 0


class RateControl:
    """Frame-level rate control. One instance per encoder stream."""

    def __init__(self, n_mb: int, gop: int, vbv_size_bytes: int = 0,
                 initial_qp: int = 33):
        self.n_mb = n_mb
        self.gop = max(gop, 1)
        self.qp = initial_qp
        self.prev_qp = initial_qp
        self.vbv = VbvState(size_bits=vbv_size_bytes * 8,
                            fullness=vbv_size_bytes * 4)  # start half full
        # online correction factors (actual/model), one per frame class
        self._gain = {True: 1.0, False: 1.0}

    # ------------------------------------------------------------------
    def frame_start(self, is_intra: bool, desired_frame_bytes: int,
                    qp_min: int, qp_max: int) -> int:
        """Pick the frame QP. Returns the QP to use."""
        if desired_frame_bytes <= 0 or qp_min == qp_max:
            self.qp = max(qp_min, min(qp_max, self.qp))
            return self.qp

        target_bits = desired_frame_bytes * 8
        # I frames get a larger budget, amortized over the GOP (the
        # reference budgets I/P jointly for equal quality)
        if is_intra and self.gop > 1:
            target_bits *= min(4.0, 1.0 + self.gop / 8.0)

        # VBV pressure: drain what the channel removes per frame and bias
        # the target toward the half-full point
        if self.vbv.configured():
            half = self.vbv.size_bits / 2
            target_bits += 0.25 * (half - self.vbv.fullness)
            target_bits = max(target_bits, self.n_mb)  # floor

        # invert the bits model for qp
        per_mb = target_bits / self.n_mb
        gain = self._gain[is_intra]
        best_qp = qp_min
        for q in range(qp_min, qp_max + 1):
            if _model_bits_per_mb(q, is_intra) * gain <= per_mb:
                best_qp = q
                break
            best_qp = q
        # limit frame-to-frame QP swing (reference dqp adaptation)
        best_qp = max(self.prev_qp - 3, min(self.prev_qp + 3, best_qp))
        self.qp = max(qp_min, min(qp_max, best_qp))
        return self.qp

    # ------------------------------------------------------------------
    def frame_end(self, is_intra: bool, actual_bytes: int,
                  desired_frame_bytes: int) -> dict:
        """Account the coded frame. Returns VBV actions:
        {"stuffing_bytes": int, "overflow": bool}."""
        actual_bits = actual_bytes * 8
        self.prev_qp = self.qp

        # adapt the model gain (EWMA of actual/model)
        model = _model_bits_per_mb(self.qp, is_intra) * self.n_mb
        if model > 0 and actual_bits > 0:
            ratio = min(max(actual_bits / model, 0.1), 10.0)
            g = self._gain[is_intra]
            self._gain[is_intra] = 0.75 * g + 0.25 * ratio

        out = {"stuffing_bytes": 0, "overflow": False}
        if self.vbv.configured() and desired_frame_bytes > 0:
            drain = desired_frame_bytes * 8
            self.vbv.fullness += actual_bits - drain
            if self.vbv.fullness > self.vbv.size_bits:
                out["overflow"] = True
                self.vbv.fullness = self.vbv.size_bits
            if self.vbv.fullness < 0:
                # channel starved: emit filler to keep CBR timing
                out["stuffing_bytes"] = int(-self.vbv.fullness) // 8
                self.vbv.fullness = 0.0
        return out

    # ------------------------------------------------------------------
    def set_vbv_state(self, fullness_bits: float):
        """Equivalent of the reference's H264E_set_vbv_state
        (`src/h264-lab.h:6898-6912`)."""
        self.vbv.fullness = fullness_bits

    # ------------------------------------------------------------------
    def get_state(self) -> dict:
        """Snapshot of all mutable RC state (checkpoint/resume)."""
        return {"qp": self.qp, "prev_qp": self.prev_qp,
                "vbv_fullness": self.vbv.fullness,
                "gain_i": self._gain[True], "gain_p": self._gain[False]}

    def set_state(self, st: dict):
        self.qp = st["qp"]
        self.prev_qp = st["prev_qp"]
        self.vbv.fullness = st["vbv_fullness"]
        self._gain = {True: st["gain_i"], False: st["gain_p"]}


def filler_nal(n_payload_bytes: int) -> bytes:
    """Filler data NAL (type 12): 0xFF payload bytes + stop bit pattern
    (spec 7.3.2.7; the reference's stuffing at `src/h264-lab.h:6109-6127`)."""
    from h264lab_tpu.bitstream.nal import annexb_nal
    n = max(n_payload_bytes, 1)
    return annexb_nal(0, 12, b"\xff" * (n - 1) + b"\x80")
