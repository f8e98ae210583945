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


def test_band_qp_offsets_counteract_drift():
    """A band predicted to blow the running budget encodes at higher QP;
    one far under encodes lower (the rc_mb_end control-law analog)."""
    rc = RateControl(n_mb=96, gop=10, vbv_size_bytes=0, initial_qp=30)
    rc.frame_start(False, 500, 10, 50)
    # skewed history: band 0 takes 70% of the frame's bits
    rc.frame_end(False, 520, 500, band_bytes=[364, 52, 52, 52])
    rc.frame_start(False, 500, 10, 50)
    qps = rc.band_qp_offsets(4, False, 500, 10, 50)
    assert len(qps) == 4
    # after the heavy band the running total is over budget -> later
    # bands must not encode at a lower QP than band 0
    assert qps[1] >= qps[0], qps
    assert max(qps) - min(qps) <= 4
    # uniform history -> uniform QPs
    rc.frame_end(False, 500, 500, band_bytes=[125] * 4)
    rc.frame_start(False, 500, 10, 50)
    assert len(set(rc.band_qp_offsets(4, False, 500, 10, 50))) == 1


def test_fine_rate_control_end_to_end():
    """fine_rate_control_flag changes the emitted bits (per-band slice
    QPs) and the stream still decodes bit-exactly vs encoder recon."""
    from h264lab_tpu.models.encoder import H264Encoder
    from h264lab_tpu.decoder.decoder import H264Decoder

    def encode(fine):
        cfg = EncoderConfig(width=64, height=64, gop=8, qp=30,
                            slice_bands=4, fine_rate_control_flag=fine)
        enc = H264Encoder(cfg)
        run = RunConfig(desired_frame_bytes=500, qp_min=20, qp_max=44)
        stream = b""
        recons = []
        for (y, u, v) in chessboard_sequence(64, 64, 6):
            r = enc.encode(y, u, v, run, return_recon=True)
            stream += r.payload
            recons.append(r.recon)
        return stream, recons

    s_fine, recons = encode(True)
    s_flat, _ = encode(False)
    assert s_fine != s_flat          # the flag is not dead
    dec = H264Decoder()
    frames = dec.decode(s_fine)
    assert len(frames) == 6
    for t, df in enumerate(frames):
        got = df.cropped(dec.sps)
        for pd, pe in zip(got, recons[t]):
            assert np.array_equal(np.asarray(pd), np.asarray(pe)), t


def test_mb_qp_delta_row_rc():
    """MB-row-granular fine RC at slice_bands=1: the encoder emits real
    mb_qp_delta syntax (reference `rc_mb_end`, `src/h264-lab.h:6146`),
    the decoder twin reconstructs bit-exactly, and QP actually varies
    within a single-slice frame."""
    import numpy as np
    from h264lab_tpu.decoder.decoder import H264Decoder
    from h264lab_tpu.models.encoder import H264Encoder

    W, H, N = 96, 96, 6
    rng = np.random.default_rng(3)
    # top rows weak noise (cheap but CODED), bottom rows strong noise
    # (expensive): the per-row bit shares force a non-uniform row QP
    # plan AND both halves keep coded macroblocks, so the plan
    # materializes as real mb_qp_delta syntax (skip MBs cannot carry a
    # dQP; a flat half would simply skip under the zero-block
    # thresholds and legally decode at the slice QP)
    strong = rng.integers(0, 256, (H // 2, W)).astype(np.int32)
    weak = 128 + rng.integers(-60, 61, (H // 2, W)).astype(np.int32)
    base = np.concatenate([weak, strong]).astype(np.uint8)
    u = np.full((H // 2, W // 2), 128, np.uint8)

    cfg = EncoderConfig(width=W, height=H, gop=N, qp=33,
                        fine_rate_control_flag=True, slice_bands=1)
    enc = H264Encoder(cfg)
    run = RunConfig(qp_min=20, qp_max=45, desired_frame_bytes=500,
                    encode_speed=2)
    stream = b""
    recons = []
    for t in range(N):
        y = np.roll(base, 2 * t, axis=0)
        r = enc.encode(y, u, u, run, return_recon=True)
        stream += r.payload
        recons.append((y, r.recon))
    dec = H264Decoder()
    frames = dec.decode(stream)
    assert len(frames) == N
    for i, f in enumerate(frames):
        got = f.cropped(dec.sps)
        np.testing.assert_array_equal(got[0], recons[i][1][0],
                                      err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(got[1], recons[i][1][1],
                                      err_msg=f"frame {i} chroma")
    # dec._mb_qp is the decoder's live per-MB QP map of the LAST frame:
    # it must show more than one QP inside the single slice — i.e.
    # nonzero mb_qp_delta was emitted and decoded
    assert int(dec._mb_qp.max() - dec._mb_qp.min()) > 0
