"""End-to-end IPPP test: encode → independent decode → bit-exact recon."""

import numpy as np
import pytest

from h264lab_tpu.config import EncoderConfig, RunConfig
from h264lab_tpu.utils.synthetic import chessboard_sequence
from h264lab_tpu.utils.metrics import psnr


@pytest.fixture(scope="module")
def codec():
    from h264lab_tpu.models.encoder import H264Encoder
    from h264lab_tpu.decoder.decoder import H264Decoder
    return H264Encoder, H264Decoder


def _roundtrip(codec, w, h, qp, n_frames, gop=20):
    H264Encoder, H264Decoder = codec
    cfg = EncoderConfig(width=w, height=h, gop=gop, qp=qp)
    enc = H264Encoder(cfg)
    stream = b""
    recons, srcs, types = [], [], []
    for (y, u, v) in chessboard_sequence(w, h, n_frames):
        res = enc.encode(y, u, v, RunConfig(qp_min=qp, qp_max=qp),
                         return_recon=True)
        stream += res.payload
        recons.append(res.recon)
        srcs.append((y, u, v))
        types.append(res.frame_type)
    dec = H264Decoder()
    frames = dec.decode(stream)
    assert len(frames) == n_frames
    return srcs, recons, [f.cropped(dec.sps) for f in frames], types


def test_ippp_bit_exact(codec):
    srcs, recons, decoded, types = _roundtrip(codec, 128, 96, 30, 4)
    assert types[0] == "IDR" and types[1] == "P"
    for i, ((ry, ru, rv), (dy, du, dv)) in enumerate(zip(recons, decoded)):
        np.testing.assert_array_equal(dy, ry, err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(du, ru, err_msg=f"frame {i} u")
        np.testing.assert_array_equal(dv, rv, err_msg=f"frame {i} v")


def test_ippp_quality_and_rate(codec):
    srcs, recons, decoded, _ = _roundtrip(codec, 128, 96, 30, 4)
    # P frames must track the moving content
    (sy, _, _), (dy, _, _) = srcs[-1], decoded[-1]
    assert psnr(sy, dy) > 33.0


def test_ippp_many_frames_with_idr_refresh(codec):
    srcs, recons, decoded, types = _roundtrip(codec, 64, 48, 32, 7, gop=3)
    assert types == ["IDR", "P", "P", "IDR", "P", "P", "IDR"]
    for i, ((ry, _, _), (dy, _, _)) in enumerate(zip(recons, decoded)):
        np.testing.assert_array_equal(dy, ry, err_msg=f"frame {i}")


def test_multi_slice_bands_bit_exact(codec):
    """Multi-slice frames (3 bands) with deblock idc=2 at slice edges."""
    H264Encoder, H264Decoder = codec
    cfg = EncoderConfig(width=128, height=96, gop=20, qp=30, slice_bands=3)
    enc = H264Encoder(cfg)
    stream = b""
    recons = []
    for (y, u, v) in chessboard_sequence(128, 96, 3):
        res = enc.encode(y, u, v, RunConfig(qp_min=30, qp_max=30),
                         return_recon=True)
        stream += res.payload
        recons.append(res.recon)
    dec = H264Decoder()
    frames = dec.decode(stream)
    assert len(frames) == 3
    for i, f in enumerate(frames):
        dy, du, dv = f.cropped(dec.sps)
        np.testing.assert_array_equal(dy, recons[i][0], err_msg=f"f{i} y")
        np.testing.assert_array_equal(du, recons[i][1], err_msg=f"f{i} u")


def test_nalu_size_splitting(codec):
    """desired_nalu_bytes re-bands frames into multiple NAL units."""
    H264Encoder, H264Decoder = codec
    from h264lab_tpu.bitstream.nal import split_annexb
    cfg = EncoderConfig(width=128, height=96, gop=1, qp=24)
    enc = H264Encoder(cfg)
    run = RunConfig(qp_min=24, qp_max=24, desired_nalu_bytes=400)
    payloads = []
    for (y, u, v) in chessboard_sequence(128, 96, 3):
        payloads.append(enc.encode(y, u, v, run).payload)
    # after the first frame the encoder knows the frame size and re-bands
    n_slices = len([n for n in split_annexb(payloads[-1])
                    if (n[0] & 0x1F) in (1, 5)])
    assert n_slices >= 2, n_slices
    dec = H264Decoder()
    frames = dec.decode(b"".join(payloads))
    assert len(frames) == 3
