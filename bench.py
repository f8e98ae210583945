#!/usr/bin/env python
"""Headline benchmark: 1080p-class encode frames/s/chip vs the C reference.

Runs on the real TPU chip (do NOT force JAX_PLATFORMS=cpu here). Encodes a
1920x1088 synthetic sequence (the reference's own chessboard fixture) at
QP 33 and reports steady-state frames/s for one chip.

Baseline: the C reference encoder (built from /root/reference, -O2, single
thread) on this host measured 16.2 fps all-intra (gop=1) and 4.64 fps IPPP
(gop=20) on the same 30-frame input (see BASELINE.md; the reference
publishes no numbers, so the locally measured ones define vs_baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from h264lab_tpu.config import EncoderConfig, RunConfig  # noqa: E402
from h264lab_tpu.models.encoder import H264Encoder  # noqa: E402
from h264lab_tpu.utils.synthetic import chessboard_sequence  # noqa: E402
from h264lab_tpu.utils.metrics import PsnrAccumulator  # noqa: E402

WIDTH, HEIGHT = 1920, 1088
QP = 33
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "16"))
WARMUP = 2

# C reference (gcc -O2, 1 thread, this host), 1920x1088 chessboard, QP 33:
REF_FPS_ALL_INTRA = 16.2   # gop=1
REF_FPS_IPPP = 4.64        # gop=20


def main():
    frames = list(chessboard_sequence(WIDTH, HEIGHT, N_FRAMES))
    cfg = EncoderConfig(width=WIDTH, height=HEIGHT, gop=1, qp=QP)
    enc = H264Encoder(cfg)
    run = RunConfig(qp_min=QP, qp_max=QP)

    total_bytes = 0
    acc = PsnrAccumulator()

    # warmup (jit compile)
    for (y, u, v) in frames[:WARMUP]:
        enc.encode(y, u, v, run)

    t0 = time.time()
    for (y, u, v) in frames[WARMUP:]:
        res = enc.encode(y, u, v, run)
        total_bytes += len(res.payload)
    dt = time.time() - t0
    n = len(frames) - WARMUP
    fps = n / dt

    print(json.dumps({
        "metric": "intra_1080p_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_FPS_ALL_INTRA, 3),
    }))


if __name__ == "__main__":
    main()
