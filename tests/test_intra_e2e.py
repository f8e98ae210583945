"""End-to-end all-intra test: encode → independent decode → bit-exact
reconstruction match (the SURVEY.md §4 validation triangle, legs 1-2)."""

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


def _encode_decode(codec, w, h, qp, n_frames=1):
    H264Encoder, H264Decoder = codec
    cfg = EncoderConfig(width=w, height=h, gop=1, qp=qp)
    enc = H264Encoder(cfg)
    stream = b""
    recons = []
    srcs = []
    for (y, u, v) in chessboard_sequence(w, h, n_frames):
        res = enc.encode(y, u, v, RunConfig(qp_min=qp, qp_max=qp),
                         return_recon=True)
        stream += res.payload
        recons.append(res.recon)
        srcs.append((y, u, v))
    dec = H264Decoder()
    frames = dec.decode(stream)
    assert len(frames) == n_frames
    decoded = [f.cropped(dec.sps) for f in frames]
    return srcs, recons, decoded


@pytest.mark.parametrize("qp", [20, 33, 45])
def test_encode_decode_bit_exact(codec, qp):
    srcs, recons, decoded = _encode_decode(codec, 128, 96, qp)
    for (ry, ru, rv), (dy, du, dv) in zip(recons, decoded):
        np.testing.assert_array_equal(dy, ry)
        np.testing.assert_array_equal(du, ru)
        np.testing.assert_array_equal(dv, rv)


def test_quality_reasonable(codec):
    srcs, recons, decoded = _encode_decode(codec, 128, 96, 26)
    (sy, su, sv), (dy, du, dv) = srcs[0], decoded[0]
    assert psnr(sy, dy) > 40.0
    assert psnr(su, du) > 45.0


def test_cropped_frame_size(codec):
    """Non-multiple-of-16 dimensions use SPS cropping."""
    srcs, recons, decoded = _encode_decode(codec, 120, 84, 30)
    assert decoded[0][0].shape == (84, 120)
    np.testing.assert_array_equal(decoded[0][0], recons[0][0])


def test_multiframe_all_intra(codec):
    srcs, recons, decoded = _encode_decode(codec, 128, 96, 30, n_frames=3)
    for (ry, _, _), (dy, _, _) in zip(recons, decoded):
        np.testing.assert_array_equal(dy, ry)
