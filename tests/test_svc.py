"""SVC two-layer spatial scalability: stream structure and base-layer
AVC compatibility."""

import numpy as np
import pytest

from h264lab_tpu.config import EncoderConfig, RunConfig
from h264lab_tpu.bitstream.nal import split_annexb
from h264lab_tpu.utils.synthetic import chessboard_sequence


@pytest.fixture(scope="module")
def svc():
    from h264lab_tpu.models.svc import SvcEncoder
    from h264lab_tpu.decoder.decoder import H264Decoder
    return SvcEncoder, H264Decoder


def test_svc_stream_structure_and_base_decode(svc):
    SvcEncoder, H264Decoder = svc
    cfg = EncoderConfig(width=128, height=96, gop=10, qp=30, num_layers=2)
    enc = SvcEncoder(cfg)
    stream = b""
    base_recons = []
    for (y, u, v) in chessboard_sequence(128, 96, 3):
        res = enc.encode(y, u, v, RunConfig(qp_min=30, qp_max=30),
                         return_recon=True)
        stream += res.payload
        base_recons.append(res.base_recon)
    types = [n[0] & 0x1F for n in split_annexb(stream)]
    assert 14 in types, "prefix NALs missing"      # SVC prefix
    assert 20 in types, "enhancement NALs missing"  # scalable slices
    assert 15 in types, "subset SPS missing"
    assert 7 in types and 8 in types and 5 in types

    # base-layer extraction: a plain AVC decoder ignores 14/15/20 and
    # reconstructs the half-resolution base layer bit-exactly. (Our
    # decoder *does* understand NAL 20 — test_svc_inter_layer_intra —
    # so model the plain-AVC view by stripping the SVC NAL types.)
    base_stream = b"".join(
        b"\x00\x00\x00\x01" + n for n in split_annexb(stream)
        if (n[0] & 0x1F) not in (14, 15, 20))
    dec = H264Decoder()
    frames = dec.decode(base_stream)
    assert len(frames) == 3
    assert dec.sps.width == 64 and dec.sps.height == 48
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f.cropped(dec.sps)[0],
                                      base_recons[i][0],
                                      err_msg=f"frame {i}")


def test_resample_roundtrip():
    from h264lab_tpu.ops import resample
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    full = rng.integers(0, 256, (64, 96), np.uint8)
    down = np.asarray(resample.downsample2x(jnp.asarray(full)))
    assert down.shape == (32, 48)
    up = np.asarray(resample.upsample2x_luma(jnp.asarray(down)))
    assert up.shape == (64, 96)
    # upsample of downsample approximates the original (smooth content)
    smooth = np.tile(np.linspace(0, 255, 96, dtype=np.uint8), (64, 1))
    d2 = np.asarray(resample.downsample2x(jnp.asarray(smooth)))
    u2 = np.asarray(resample.upsample2x_luma(jnp.asarray(d2)))
    assert np.abs(u2.astype(int) - smooth.astype(int)).mean() < 4.0
    uc = np.asarray(resample.upsample2x_chroma(jnp.asarray(d2)))
    assert uc.shape == smooth.shape


def test_svc_inter_layer_intra(svc):
    """inter_layer_pred_flag=1: enhancement I/IDR frames are base-mode
    (predicted from the upsampled base recon, reference
    `src/h264-lab.h:5754-5764`). Checks: (a) the NAL-20 stream decodes
    and the enhancement recon is bit-exact against the decoder twin;
    (b) the ILP IDR costs fewer bits than the non-ILP IDR at equal QP
    with comparable PSNR (the flag is live, not cosmetic)."""
    SvcEncoder, H264Decoder = svc
    qp = 30
    run = RunConfig(qp_min=qp, qp_max=qp, encode_speed=2)
    # low-pass 2D texture: survives the dyadic downsample, so the
    # upsampled base layer is a near-perfect predictor — the content
    # class inter-layer intra prediction exists for (plain directional
    # intra cannot extrapolate 2D texture)
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (96, 128)).astype(np.float64)
    for _ in range(5):
        for ax in (0, 1):
            base = (np.roll(base, 1, ax) + 2 * base
                    + np.roll(base, -1, ax)) / 4
    tex = base.astype(np.uint8)
    u8 = np.full((48, 64), 128, np.uint8)
    frames = [(np.roll(tex, t, axis=1), u8, u8) for t in range(3)]
    stats = {}
    for ilp in (False, True):
        cfg = EncoderConfig(width=128, height=96, gop=10, qp=qp,
                            num_layers=2, inter_layer_pred_flag=ilp)
        enc = SvcEncoder(cfg)
        stream = b""
        recons = []
        enh_idr = None
        for (y, u, v) in frames:
            res = enc.encode(y, u, v, run, return_recon=True)
            stream += res.payload
            recons.append(res.recon)
            if enh_idr is None:
                enh_idr = len(res.enh_payload)
        dec = H264Decoder()
        dec.decode(stream)
        assert len(dec.frames) == 3          # base layer
        assert len(dec.enh_frames) == 3      # enhancement layer
        for i, f in enumerate(dec.enh_frames):
            got = f.cropped(f.sps)
            np.testing.assert_array_equal(got[0], recons[i][0],
                                          err_msg=f"ilp={ilp} frame {i} Y")
            np.testing.assert_array_equal(got[1], recons[i][1],
                                          err_msg=f"ilp={ilp} frame {i} U")
        y0 = frames[0][0].astype(np.float64)
        r0 = dec.enh_frames[0].cropped(dec.enh_frames[0].sps)[0]
        mse = ((y0 - r0) ** 2).mean()
        stats[ilp] = (enh_idr, 10 * np.log10(255.0 ** 2 / mse))
    # inter-layer prediction must pay off on the IDR: clearly fewer bits
    # (here ~2/3) at PSNR within ~1 dB of the plain intra IDR (1.25 dB
    # guard band: the exact figure moves a few hundredths with encoder
    # tuning, e.g. the round-5 zero-block thresholds)
    assert stats[True][0] < stats[False][0], stats
    assert stats[True][1] > stats[False][1] - 1.25, stats
