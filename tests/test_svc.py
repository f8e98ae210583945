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
    # reconstructs the half-resolution base layer bit-exactly
    dec = H264Decoder()
    frames = dec.decode(stream)
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
