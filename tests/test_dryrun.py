"""The driver's multi-chip acceptance gate, run in-repo.

Round-2 regression postmortem: per-lane idr_pic_id made identical
GOP-parallel lanes emit different byte counts, which the driver dryrun
(identical frames to every lane, equal-stream assertion) caught while
the test suite stayed green. This file runs the exact dryrun on the
8-device CPU mesh so the gate can never silently diverge from the suite
again, plus the underlying invariants on their own.
"""

import numpy as np
import jax
import pytest

from h264lab_tpu.config import EncoderConfig, RunConfig
from h264lab_tpu.models.encoder import H264Encoder
from h264lab_tpu.parallel.gop import GopBandEncoder, encode_stream
from h264lab_tpu.utils.synthetic import chessboard_sequence

import __graft_entry__


def test_driver_dryrun_multichip_8():
    assert len(jax.devices()) >= 8, (
        "conftest must provide the 8-device CPU mesh; refusing to skip "
        "(a skipped gate is how round 2 went red)")
    __graft_entry__.dryrun_multichip(8)


def test_driver_dryrun_multichip_odd():
    # odd device counts take the n_band=1 path
    __graft_entry__.dryrun_multichip(3)


def test_identical_lanes_byte_identical():
    """Standalone GopBandEncoder lanes with identical input produce
    byte-identical streams (no mesh: pure lane-batched on one device)."""
    W, H = 64, 48
    cfg = EncoderConfig(width=W, height=H, gop=3, qp=31)
    enc = GopBandEncoder(cfg, n_gop=3)
    run = RunConfig(qp_min=31, qp_max=31, encode_speed=2)
    streams = [b""] * 3
    for f in chessboard_sequence(W, H, 4):
        for g, r in enumerate(enc.encode_step([f] * 3, run)):
            streams[g] += r.payload
    assert streams[1] == streams[0]
    assert streams[2] == streams[0]


def test_encode_stream_matches_sequential():
    """encode_stream (per-lane idr_pic_id path) stays bit-identical to
    the sequential encoder at fixed QP."""
    W, H = 64, 48
    n_frames, gop = 6, 3
    frames = list(chessboard_sequence(W, H, n_frames))
    cfg = EncoderConfig(width=W, height=H, gop=gop, qp=31)
    run = RunConfig(qp_min=31, qp_max=31, encode_speed=2)

    seq = H264Encoder(cfg)
    expected = b"".join(seq.encode(*f, run).payload for f in frames)
    got = encode_stream(frames, cfg, n_gop=2, run=run)
    assert got == expected
