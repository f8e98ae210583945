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
            # (zero-block thresholding trades ~1 dB of fixed-QP interior
            # PSNR for bits — ops/tuning.py; a failed pan track sits far
            # below 30 dB)
            assert psnr > 36.0, f"frame {i}: interior psnr {psnr:.1f}"
    # P frames with tracked MVs stay below the intra refresh cost
    assert max(sizes[1:]) < sizes[0], sizes


def test_prev_mv_candidate_reaches_beyond_coarse_range():
    """Mechanism check on ops/me.py directly: a 40-px shift is outside
    the coarse +-32 window (+-3 refine), so the zero/coarse candidates
    top out at |mv| <= 35 — but a converged previous-MV centre makes the
    exact displacement reachable."""
    import jax.numpy as jnp
    from h264lab_tpu.models import refstate, wavefront
    from h264lab_tpu.ops import me

    mbw, mbh = 8, 4
    w, h = 16 * mbw, 16 * mbh
    frames = list(_texture(2))
    ref_y = np.asarray(frames[0][0][:h, :w])
    cur_y = np.asarray(frames[1][0][:h, :w])      # -SHIFT px shifted
    u = np.full((h // 2, w // 2), 128, np.uint8)
    ref = refstate.prepare_reference(
        jnp.asarray(wavefront.mb_tiles(ref_y, 16)),
        jnp.asarray(wavefront.mb_tiles(u, 8)),
        jnp.asarray(wavefront.mb_tiles(u, 8)), mbw, mbh)
    nmb = mbw * mbh
    rr = jnp.arange(nmb, dtype=jnp.int32) // mbw
    cc = jnp.arange(nmb, dtype=jnp.int32) % mbw
    base_y = me.qpel.GUARD + 16 * rr
    base_x = me.qpel.GUARD + 16 * cc
    tiles = jnp.asarray(wavefront.mb_tiles(cur_y, 16))

    def search(prev_mx_val):
        prev = jnp.full((nmb,), prev_mx_val, jnp.int32)
        mvy, mvx, cost, pred, aux = me.motion_search_dense(
            jnp.asarray(cur_y), tiles, ref["y_pad"], ref["y4_pad"],
            base_y, base_x, jnp.int32(QP), mbh, mbw, 0,
            prev_my=jnp.zeros((nmb,), jnp.int32), prev_mx=prev)
        return np.asarray(mvx) // 4               # full-pel

    # the crop makes cur[x] = ref[x + SHIFT]: the true MV is +SHIFT.
    # Only MBs whose +SHIFT window stays inside the crop are comparable
    # (cols 0..3: x + SHIFT + 15 < w).
    interior = np.arange(nmb) % mbw < 4
    without = search(0)[interior]
    with_prev = search(37)[interior]
    # without the centre, +SHIFT is structurally unreachable (coarse
    # +-32 plus +-3 refine caps |mv| at 35; aliased blob matches within
    # range win instead); with it, a solid share of interior MBs land on
    # the exact displacement (the rest keep cheaper aliases — the blob
    # field repeats at ~16 px, so several positions tie in SAD and the
    # lambda*mv-bits term decides)
    assert np.all(np.abs(without) <= 35), without
    n_exact = int(np.sum(with_prev == SHIFT))
    assert n_exact >= len(with_prev) // 4, with_prev
