"""Deblock raster-order conformance: the spec processes MBs in raster
scan (decoder/deblock_dec.py), which makes MB (r,c)'s top-edge H filter
read pixels written by MB (r-1,c+1)'s left-edge V filter. A slope-1
deblock wavefront misses that dependency; this test drives content that
exercises it (smooth gradients + texture so bS=2 edges actually filter)
and requires bit-exact encoder/decoder agreement.
"""

import numpy as np
import pytest

from h264lab_tpu.config import EncoderConfig, RunConfig


def _textured_gradient(w, h, t):
    """Smooth diagonal gradient + low-amplitude texture, shifting over
    time: P-frame residuals quantize nonzero (bS=2) while surfaces stay
    smooth enough that |p0-q0| < alpha and the filters engage."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx + 2 * yy + 3 * t) // 3 % 200 + 20
    rng = np.random.default_rng(1234 + t)
    tex = rng.integers(-6, 7, (h, w))
    y = np.clip(base + tex, 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = ((yy[: h // 2, : w // 2] + t) % 40 + 100).astype(np.uint8)
    return y, u, v


def test_deblock_raster_order_bit_exact():
    from h264lab_tpu.models.encoder import H264Encoder
    from h264lab_tpu.decoder.decoder import H264Decoder

    w, h, qp = 96, 64, 38          # high QP: strong deblocking
    cfg = EncoderConfig(width=w, height=h, gop=20, qp=qp)
    enc = H264Encoder(cfg)
    stream = b""
    recons = []
    for t in range(3):
        y, u, v = _textured_gradient(w, h, t)
        res = enc.encode(y, u, v, RunConfig(qp_min=qp, qp_max=qp),
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
        np.testing.assert_array_equal(dv, recons[i][2], err_msg=f"f{i} v")
