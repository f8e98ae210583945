"""Temporal denoise pre-filter behavior."""

import numpy as np

from h264lab_tpu.config import EncoderConfig, RunConfig
from h264lab_tpu.utils.synthetic import chessboard_sequence


def test_denoise_reduces_noise_passes_motion():
    import jax.numpy as jnp
    from h264lab_tpu.ops import denoise
    rng = np.random.default_rng(0)
    base = rng.integers(60, 200, (64, 64)).astype(np.uint8)
    noisy = np.clip(base.astype(int)
                    + rng.integers(-3, 4, base.shape), 0, 255).astype(np.uint8)
    out = np.asarray(denoise.denoise_plane(jnp.asarray(noisy),
                                           jnp.asarray(base)))
    # small noise is pulled toward the reference frame
    assert np.abs(out.astype(int) - base.astype(int)).mean() < \
        np.abs(noisy.astype(int) - base.astype(int)).mean()
    # large changes (motion) pass through nearly untouched
    moved = base.copy()
    moved[:32] = 255 - moved[:32]
    out2 = np.asarray(denoise.denoise_plane(jnp.asarray(moved),
                                            jnp.asarray(base)))
    assert np.abs(out2[:16].astype(int) - moved[:16].astype(int)).mean() < 1.0


def test_denoise_end_to_end_decodes():
    from h264lab_tpu.models.encoder import H264Encoder
    from h264lab_tpu.decoder.decoder import H264Decoder
    cfg = EncoderConfig(width=64, height=48, gop=10, qp=30,
                        temporal_denoise_flag=True)
    enc = H264Encoder(cfg)
    stream = b""
    for (y, u, v) in chessboard_sequence(64, 48, 3):
        stream += enc.encode(y, u, v, RunConfig(qp_min=30, qp_max=30)).payload
    dec = H264Decoder()
    assert len(dec.decode(stream)) == 3
