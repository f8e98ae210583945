#!/usr/bin/env python
"""Headline benchmark: 1080p-class IPPP encode frames/s on one TPU chip.

Runs on the real TPU chip (do NOT force JAX_PLATFORMS=cpu here). Encodes a
1920x1088 synthetic sequence (the reference's own chessboard fixture) with
GOP 20 at QP 33 — the full pipeline: 3-stage motion search, qpel MC,
inter/intra16/intra4x4 decision, deblocking, CAVLC with device-side bit
packing.

Baseline: the C reference encoder (built from /root/reference, gcc -O2,
single thread, this host) measured 4.64 fps on the same 30-frame input at
GOP 20 / QP 33 (all-intra gop=1: 16.2 fps). The reference publishes no
numbers (BASELINE.md), so these locally measured figures define
vs_baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from h264lab_tpu.config import EncoderConfig, RunConfig  # noqa: E402
from h264lab_tpu.models.encoder import H264Encoder  # noqa: E402
from h264lab_tpu.utils.synthetic import chessboard_sequence  # noqa: E402

WIDTH, HEIGHT = 1920, 1088
QP = 33
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "16"))
WARMUP = 3
SPEED = int(os.environ.get("BENCH_SPEED", "2"))

REF_FPS_IPPP = 4.64        # gop=20, this host, 1 thread


def main():
    frames = list(chessboard_sequence(WIDTH, HEIGHT, N_FRAMES))
    cfg = EncoderConfig(width=WIDTH, height=HEIGHT, gop=20, qp=QP)
    enc = H264Encoder(cfg)
    run = RunConfig(qp_min=QP, qp_max=QP, encode_speed=SPEED)

    total_bytes = 0
    # warmup (jit compile of I and P pipelines)
    for (y, u, v) in frames[:WARMUP]:
        enc.encode(y, u, v, run)

    # two-stage pipeline: the device computes frame N+1 while the host
    # packs frame N
    t0 = time.time()
    pending = None
    for (y, u, v) in frames[WARMUP:]:
        nxt = enc.encode_async(y, u, v, run)
        if pending is not None:
            total_bytes += len(enc.finish(pending).payload)
        pending = nxt
    if pending is not None:
        total_bytes += len(enc.finish(pending).payload)
    dt = time.time() - t0
    n = len(frames) - WARMUP
    fps = n / dt

    print(json.dumps({
        "metric": "ippp_1080p_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / REF_FPS_IPPP, 3),
    }))


if __name__ == "__main__":
    main()
