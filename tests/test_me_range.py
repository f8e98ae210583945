"""Motion-vector reach beyond the coarse stage's +-32 px.

The dense coarse search covers +-32 full-pel (reference MV_RANGE,
`src/h264-lab.h:3222`); the previous-frame-MV candidate centre
(ops/me.py `prev_my`/`prev_mx`, carried by H264Encoder/GopBandEncoder)
accumulates across frames, so constant panning faster than 32 px/frame
becomes reachable after the first frame — the dense analog of the
reference's candidate harvest (`src/h264-lab.h:5370-5412`).
"""

import numpy as np

from h264lab_tpu.config import EncoderConfig, RunConfig
from h264lab_tpu.models.encoder import H264Encoder

W, H = 192, 96
SHIFT = 40        # px/frame horizontal pan, beyond the +-32 coarse range
QP = 30


def _texture(n_frames):
    """Horizontally panning high-contrast blob field (wrap-around),
    trackable only with MVs of -SHIFT px/frame. Blob scale ~16 px with
    soft edges: the SAD landscape has a real gradient toward the true
    motion even from several pixels off (pure noise would not), and a
    mismatch costs tens of dB (smooth content would not)."""
    rng = np.random.default_rng(7)
    cells = rng.integers(0, 2, (H // 16 + 2, W // 16 + 2)) * 255
    field = np.kron(cells, np.ones((16, 16)))[:H, :W].astype(np.float64)
    for _ in range(4):
        for ax in (0, 1):
            field = (np.roll(field, 1, ax) + 2 * field
                     + np.roll(field, -1, ax)) / 4
    base = field.astype(np.uint8)
    u = np.full((H // 2, W // 2), 128, np.uint8)
    for t in range(n_frames):
        yield np.roll(base, -SHIFT * t, axis=1), u, u


def test_prev_mv_extends_reach():
    frames = list(_texture(5))
    cfg = EncoderConfig(width=W, height=H, gop=8, qp=QP)
    enc = H264Encoder(cfg)
    run = RunConfig(qp_min=QP, qp_max=QP, encode_speed=2)
    sizes = []
    for i, (y, u, v) in enumerate(frames):
        r = enc.encode(y, u, v, run, return_recon=True)
        sizes.append(len(r.payload))
        if i >= 3:
            # MV field must track the pan: the interior reconstructs
            # near-losslessly once the prev-MV candidate has converged
            # (frame 1 reaches -35 = coarse -32 + refine -3; frame 2
            # -38; frame 3 reaches the true -40 via the accumulated
            # centre — impossible with the coarse range alone)
            err = (r.recon[0].astype(np.int64) - y.astype(np.int64))
            interior = err[16:-16, 48:-48]
            psnr = 10 * np.log10(255.0 ** 2 /
                                 max((interior ** 2).mean(), 1e-9))
            assert psnr > 38.0, f"frame {i}: interior psnr {psnr:.1f}"
    # P frames with converged MVs must be far cheaper than the IDR
    assert sizes[4] < sizes[0] // 3, sizes
