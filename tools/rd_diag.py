"""Per-frame RD diagnostic vs the C reference encoder.

For one QP, prints per-frame (bytes, luma PSNR) for the reference
encoder and ours, so RD deficits can be attributed to I vs P frames,
and to rate vs distortion. Runs on CPU.

    python tools/rd_diag.py [qp] [speed] [w] [h] [n]
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from h264lab_tpu.utils.synthetic import chessboard_sequence  # noqa: E402

REF_SRC = "/root/reference/src"

DRIVER_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "h264-lab.h"

int main(int argc, char **argv)
{
    int w = atoi(argv[1]), h = atoi(argv[2]), n = atoi(argv[3]);
    int speed = atoi(argv[4]), gop = atoi(argv[5]), qp = atoi(argv[6]);
    const char *yuv_path = argv[7], *rec_path = argv[8];
    int frame_size = w * h * 3 / 2, i, err;
    unsigned char *buf = malloc(frame_size + 64);
    FILE *fin = fopen(yuv_path, "rb");
    FILE *frec = fopen(rec_path, "wb");
    H264E_create_param_t cp;
    H264E_run_param_t rp;
    H264E_io_yuv_t yuv;
    H264E_persist_t *enc;
    H264E_scratch_t *scratch;
    int sizeof_persist = 0, sizeof_scratch = 0;

    memset(&cp, 0, sizeof(cp));
    cp.width = w;
    cp.height = h;
    cp.gop = gop;
    cp.vbv_size_bytes = 100000 / 8;
    cp.const_input_flag = 0;
    cp.enableNEON = 1;
#if H264E_SVC_API
    cp.num_layers = 1;
#endif
    err = H264E_sizeof(&cp, &sizeof_persist, &sizeof_scratch);
    if (err) return 1;
    enc = malloc(sizeof_persist);
    scratch = malloc(sizeof_scratch);
    err = H264E_init(enc, &cp);
    if (err) return 1;

    for (i = 0; i < n; i++)
    {
        unsigned char *coded;
        int coded_size = 0;
        if (fread(buf, frame_size, 1, fin) != 1) return 2;
        yuv.yuv[0] = buf;                 yuv.stride[0] = w;
        yuv.yuv[1] = buf + w * h;         yuv.stride[1] = w / 2;
        yuv.yuv[2] = buf + w * h * 5 / 4; yuv.stride[2] = w / 2;
        memset(&rp, 0, sizeof(rp));
        rp.encode_speed = speed;
        rp.qp_min = rp.qp_max = qp;
        err = H264E_encode(enc, scratch, &rp, &yuv, &coded, &coded_size);
        if (err) return 1;
        printf("%d\n", coded_size);
        fwrite(buf, frame_size, 1, frec);
    }
    return 0;
}
"""


def psnr_y(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.0
    return 10.0 * np.log10(255.0 ** 2 / mse)


def run_ref(frames, raw, w, h, n, speed, gop, qp):
    rows = []
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "driver.c")
        exe = os.path.join(td, "ref_rd")
        yin = os.path.join(td, "in.yuv")
        rec = os.path.join(td, "rec.yuv")
        with open(src, "w") as f:
            f.write(DRIVER_C)
        with open(yin, "wb") as f:
            f.write(raw)
        subprocess.check_call(
            ["gcc", "-O2", "-I", REF_SRC, "-o", exe, src, "-lm"])
        out = subprocess.check_output(
            [exe, str(w), str(h), str(n), str(speed), str(gop), str(qp),
             yin, rec]).decode()
        sizes = [int(x) for x in out.split()]
        with open(rec, "rb") as f:
            for i, (y, u, v) in enumerate(frames):
                ry = np.frombuffer(f.read(w * h), np.uint8).reshape(h, w)
                f.read(w * h // 2)
                rows.append((sizes[i], psnr_y(y, ry)))
    return rows


def run_ours(frames, w, h, speed, gop, qp):
    from h264lab_tpu.config import EncoderConfig, RunConfig
    from h264lab_tpu.models.encoder import H264Encoder
    cfg = EncoderConfig(width=w, height=h, gop=gop, qp=qp)
    enc = H264Encoder(cfg)
    run = RunConfig(qp_min=qp, qp_max=qp, encode_speed=speed)
    rows = []
    for (y, u, v) in frames:
        r = enc.encode(y, u, v, run, return_recon=True)
        rows.append((len(r.payload), psnr_y(y, r.recon[0])))
    return rows


def main():
    qp = int(sys.argv[1]) if len(sys.argv) > 1 else 27
    speed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    h = int(sys.argv[4]) if len(sys.argv) > 4 else 96
    n = int(sys.argv[5]) if len(sys.argv) > 5 else 12
    gop = n
    frames = list(chessboard_sequence(w, h, n))
    raw = b"".join(y.tobytes() + u.tobytes() + v.tobytes()
                   for y, u, v in frames)
    ref = run_ref(frames, raw, w, h, n, speed, gop, qp)
    ours = run_ours(frames, w, h, speed, gop, qp)
    print(f"qp={qp} speed={speed} {w}x{h} n={n}")
    print(f"{'frm':>3} {'ref_B':>7} {'ref_dB':>7} {'our_B':>7} "
          f"{'our_dB':>7} {'dB diff':>8} {'B diff':>7}")
    for i, ((rb, rp), (ob, op)) in enumerate(zip(ref, ours)):
        print(f"{i:3d} {rb:7d} {rp:7.2f} {ob:7d} {op:7.2f} "
              f"{op - rp:+8.2f} {ob - rb:+7d}")
    print(f"tot {sum(r[0] for r in ref):7d} {np.mean([r[1] for r in ref]):7.2f} "
          f"{sum(o[0] for o in ours):7d} {np.mean([o[1] for o in ours]):7.2f}")


if __name__ == "__main__":
    main()
