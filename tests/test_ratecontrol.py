"""Rate control: bitrate tracking, VBV policies, transparent frames."""

import numpy as np
import pytest

from h264lab_tpu.config import EncoderConfig, RunConfig
from h264lab_tpu.rc.ratecontrol import RateControl, filler_nal
from h264lab_tpu.utils.synthetic import chessboard_sequence


def test_rc_unit_converges_to_target():
    rc = RateControl(n_mb=99, gop=20, vbv_size_bytes=12500, initial_qp=33)
    target = 1200  # bytes/frame
    qp_hist = []
    for i in range(40):
        is_i = i % 20 == 0
        qp = rc.frame_start(is_i, target, 10, 50)
        qp_hist.append(qp)
        # synthetic "encoder": bits halve per 6 qp steps
        actual = int((3000 if is_i else 1500) * 2 ** ((30 - qp) / 6.0))
        rc.frame_end(is_i, actual, target)
    # after adaptation the P-frame sizes should be near target
    qp = rc.frame_start(False, target, 10, 50)
    actual = int(1500 * 2 ** ((30 - qp) / 6.0))
    assert abs(actual - target) / target < 0.6


def test_filler_nal_shape():
    f = filler_nal(10)
    assert f[:4] == b"\x00\x00\x00\x01"
    assert f[4] == 12  # nal type, ref_idc 0


def test_bitrate_mode_end_to_end():
    from h264lab_tpu.models.encoder import H264Encoder
    cfg = EncoderConfig(width=128, height=96, gop=10, qp=33,
                        vbv_size_bytes=12500)
    enc = H264Encoder(cfg)
    target = 900  # bytes/frame ~ 216 kbps @30fps
    sizes = []
    for (y, u, v) in chessboard_sequence(128, 96, 12):
        run = RunConfig(desired_frame_bytes=target, qp_min=10, qp_max=50)
        res = enc.encode(y, u, v, run)
        sizes.append(len(res.payload))
    # steady-state P frames should track the target within 2x
    steady = sizes[5:10]
    avg = sum(steady) / len(steady)
    assert 0.3 * target < avg < 2.5 * target, sizes


def test_transparent_frame_on_overflow():
    from h264lab_tpu.models.encoder import H264Encoder
    from h264lab_tpu.decoder.decoder import H264Decoder
    cfg = EncoderConfig(width=64, height=48, gop=0, qp=20,
                        vbv_size_bytes=400,
                        vbv_overflow_empty_frame_flag=True)
    enc = H264Encoder(cfg)
    stream = b""
    types = []
    sizes = []
    for (y, u, v) in chessboard_sequence(64, 48, 5):
        run = RunConfig(desired_frame_bytes=100, qp_min=20, qp_max=24)
        res = enc.encode(y, u, v, run, return_recon=True)
        stream += res.payload
        types.append(res.frame_type)
        sizes.append(len(res.payload))
    # tiny VBV must trigger at least one all-skip frame
    assert any(s < 30 for s in sizes[1:]), sizes
    dec = H264Decoder()
    frames = dec.decode(stream)
    assert len(frames) == 5
