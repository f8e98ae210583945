"""Long-term references: Golden/Recovery/Droppable frame types and the
dyadic temporal-scalability schedule from the reference driver
(`src/minih264e_test.c:606-638`)."""

import numpy as np
import pytest

from h264lab_tpu.config import EncoderConfig, RunConfig, FrameType
from h264lab_tpu.utils.synthetic import chessboard_sequence


@pytest.fixture(scope="module")
def codec():
    from h264lab_tpu.models.encoder import H264Encoder
    from h264lab_tpu.decoder.decoder import H264Decoder
    return H264Encoder, H264Decoder


def _encode_types(codec, types, w=64, h=48, qp=30, n_lt=2):
    H264Encoder, H264Decoder = codec
    cfg = EncoderConfig(width=w, height=h, gop=0, qp=qp,
                        max_long_term_reference_frames=n_lt)
    enc = H264Encoder(cfg)
    stream = b""
    recons = []
    frames_in = list(chessboard_sequence(w, h, len(types)))
    for ft, (y, u, v) in zip(types, frames_in):
        run = RunConfig(frame_type=ft, qp_min=qp, qp_max=qp)
        res = enc.encode(y, u, v, run, return_recon=True)
        stream += res.payload
        recons.append(res.recon)
    dec = H264Decoder()
    decoded = dec.decode(stream)
    return recons, [f.cropped(dec.sps) for f in decoded]


def test_golden_recovery_bit_exact(codec):
    types = [FrameType.KEY, FrameType.P, FrameType.GOLDEN,
             FrameType.P, FrameType.RECOVERY, FrameType.P]
    recons, decoded = _encode_types(codec, types)
    assert len(decoded) == len(types)
    for i, ((ry, ru, rv), (dy, du, dv)) in enumerate(zip(recons, decoded)):
        np.testing.assert_array_equal(dy, ry, err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(du, ru, err_msg=f"frame {i} u")


def test_droppable_frames(codec):
    """Droppable frames are non-reference: dropping them must not affect
    the decode of the remaining stream."""
    H264Encoder, H264Decoder = codec
    from h264lab_tpu.bitstream.nal import split_annexb, annexb_nal
    cfg = EncoderConfig(width=64, height=48, gop=0, qp=30)
    enc = H264Encoder(cfg)
    types = [FrameType.KEY, FrameType.DROPPABLE, FrameType.P,
             FrameType.DROPPABLE, FrameType.P]
    payloads = []
    recons = []
    for ft, (y, u, v) in zip(types,
                             chessboard_sequence(64, 48, len(types))):
        res = enc.encode(y, u, v, RunConfig(frame_type=ft, qp_min=30,
                                            qp_max=30), return_recon=True)
        payloads.append(res.payload)
        recons.append(res.recon)
    # droppable slices carry nal_ref_idc == 0
    for i in (1, 3):
        nals = split_annexb(payloads[i])
        assert all((n[0] >> 5) == 0 for n in nals if (n[0] & 31) in (1, 5))
    # full stream decodes to all frames
    dec = H264Decoder()
    assert len(dec.decode(b"".join(payloads))) == 5
    # stream without droppables still decodes the P chain bit-exact
    dec2 = H264Decoder()
    frames = dec2.decode(payloads[0] + payloads[2] + payloads[4])
    np.testing.assert_array_equal(frames[-1].cropped(dec2.sps)[0],
                                  recons[4][0])


def test_dyadic_temporal_schedule(codec):
    """The reference driver's 2-level temporal pyramid via CUSTOM types."""
    H264Encoder, H264Decoder = codec
    cfg = EncoderConfig(width=64, height=48, gop=0, qp=32,
                        max_long_term_reference_frames=3)
    enc = H264Encoder(cfg)
    stream = b""
    recons = []
    logmod = 1
    mod = 1 << logmod
    fresh = {k: -1 for k in range(logmod + 1)}
    for i, (y, u, v) in enumerate(chessboard_sequence(64, 48, 6)):
        level = logmod
        while level and (~i & (mod >> level)):
            level -= 1
        lt_update = level + 1
        if level == logmod and logmod > 0:
            lt_update = -1
        lt_use = fresh[level]
        for j in range(level, logmod + 1):
            fresh[j] = lt_update
        run = RunConfig(frame_type=FrameType.CUSTOM,
                        long_term_idx_use=(-1 if i == 0 else lt_use),
                        long_term_idx_update=lt_update,
                        qp_min=32, qp_max=32)
        res = enc.encode(y, u, v, run, return_recon=True)
        stream += res.payload
        recons.append(res.recon)
    dec = H264Decoder()
    frames = dec.decode(stream)
    assert len(frames) == 6
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f.cropped(dec.sps)[0], recons[i][0],
                                      err_msg=f"frame {i}")


def test_cli_dyadic_schedule_sequence():
    """The CLI --temporal-layers schedule reproduces the reference
    driver's dyadic long-term-index sequence (src/minih264e_test.c:
    606-638) without touching the encoder (pure schedule logic)."""
    from h264lab_tpu.cli import DyadicSchedule

    sched = DyadicSchedule(1)
    got = [sched.step(i) for i in range(6)]
    # frame 0: IDR (use -1), stored to LTR slot 1; odd frames droppable
    # (update -1) predicting from slot 1; even frames refresh slot 1
    assert [g[1:] for g in got] == [
        (-1, 1), (1, -1), (1, 1), (1, -1), (1, 1), (1, -1)]
    assert all(g[0] == FrameType.CUSTOM for g in got)

    sched = DyadicSchedule(2)
    got = [sched.step(i)[1:] for i in range(8)]
    # 4-frame period: level0 -> slot1, level1 -> short-term (0),
    # level2 (odd frames) -> droppable
    assert got == [(-1, 1), (1, -1), (1, 0), (0, -1),
                   (1, 1), (1, -1), (1, 0), (0, -1)]
