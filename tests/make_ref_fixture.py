"""Regenerate the leg-3 fixture stream for test_reference_streams.py.

The binary ``.264`` fixture is gitignored (binary assets are not
committed); this script rebuilds it hermetically from the read-only C
reference at ``/root/reference`` and verifies the reconstruction hashes
against the committed ``ref_ippp_qp20_s1.json``:

1. generate 3 frames of the 128x96 rotating chessboard with our Python
   clone of the reference driver's generator
   (``h264lab_tpu/utils/synthetic.py``),
2. compile a minimal C driver against the reference single-header
   encoder (``/root/reference/src/h264-lab.h``) with the reference
   driver's exact create/run parameters
   (``src/minih264e_test.c:507-604``: gop=20, vbv=100000/8 bytes,
   const_input_flag=0 so the encoder reconstructs in place, fixed
   QP 20, encode_speed=1),
3. write ``tests/fixtures/ref_ippp_qp20_s1.264`` and check the sha256 of
   each reconstructed plane against the committed JSON (or rewrite the
   JSON when run with ``--update``).

Run:  python tests/make_ref_fixture.py
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from h264lab_tpu.utils.synthetic import chessboard_sequence  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
BASE = os.path.join(FIXDIR, "ref_ippp_qp20_s1")
REF_SRC = "/root/reference/src"

W, H, N_FRAMES, QP, SPEED, GOP = 128, 96, 3, 20, 1, 20

DRIVER_C = r"""
/* Minimal fixture driver for the reference encoder (not part of the
 * framework): encode N YUV420 frames from stdin-file at fixed QP with
 * in-place reconstruction, append NALUs to out.264, dump recon planes. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "h264-lab.h"

int main(int argc, char **argv)
{
    int w = atoi(argv[1]), h = atoi(argv[2]), n = atoi(argv[3]);
    int qp = atoi(argv[4]), speed = atoi(argv[5]), gop = atoi(argv[6]);
    FILE *fin = fopen(argv[7], "rb");
    FILE *f264 = fopen(argv[8], "wb");
    FILE *frec = fopen(argv[9], "wb");
    int frame_size = w * h * 3 / 2, i, err;
    int sizeof_persist = 0, sizeof_scratch = 0;
    unsigned char *buf = malloc(frame_size + 64);
    H264E_create_param_t cp;
    H264E_run_param_t rp;
    H264E_io_yuv_t yuv;
    H264E_persist_t *enc;
    H264E_scratch_t *scratch;

    memset(&cp, 0, sizeof(cp));
    cp.width = w;
    cp.height = h;
    cp.gop = gop;
    cp.vbv_size_bytes = 100000 / 8;   /* minih264e_test.c:524 */
    cp.const_input_flag = 0;          /* reconstruct into input buffer */
    cp.enableNEON = 1;
#if H264E_SVC_API
    cp.num_layers = 1;
#endif
    err = H264E_sizeof(&cp, &sizeof_persist, &sizeof_scratch);
    if (err) { fprintf(stderr, "sizeof err %d\n", err); return 1; }
    enc = malloc(sizeof_persist);
    scratch = malloc(sizeof_scratch);
    err = H264E_init(enc, &cp);
    if (err) { fprintf(stderr, "init err %d\n", err); return 1; }

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
        rp.qp_min = rp.qp_max = qp;       /* fixed-QP mode */
        err = H264E_encode(enc, scratch, &rp, &yuv, &coded, &coded_size);
        if (err) { fprintf(stderr, "encode err %d\n", err); return 1; }
        fwrite(coded, coded_size, 1, f264);
        fwrite(buf, frame_size, 1, frec); /* buf now holds the recon */
    }
    return 0;
}
"""


def main() -> int:
    update = "--update" in sys.argv
    os.makedirs(FIXDIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "driver.c")
        exe = os.path.join(td, "ref_enc")
        yin = os.path.join(td, "in.yuv")
        rec = os.path.join(td, "rec.yuv")
        with open(src, "w") as f:
            f.write(DRIVER_C)
        with open(yin, "wb") as f:
            for y, u, v in chessboard_sequence(W, H, N_FRAMES):
                f.write(y.tobytes() + u.tobytes() + v.tobytes())
        subprocess.check_call(
            ["gcc", "-O2", "-I", REF_SRC, "-o", exe, src, "-lm"])
        subprocess.check_call(
            [exe, str(W), str(H), str(N_FRAMES), str(QP), str(SPEED),
             str(GOP), yin, BASE + ".264", rec])

        frames = []
        with open(rec, "rb") as f:
            for _ in range(N_FRAMES):
                y = f.read(W * H)
                u = f.read(W * H // 4)
                v = f.read(W * H // 4)
                frames.append({
                    "y": hashlib.sha256(y).hexdigest(),
                    "u": hashlib.sha256(u).hexdigest(),
                    "v": hashlib.sha256(v).hexdigest(),
                })
    meta = {"width": W, "height": H, "frames": frames}
    if update:
        with open(BASE + ".json", "w") as f:
            json.dump(meta, f, indent=1)
        print("fixture + json written")
        return 0
    committed = json.load(open(BASE + ".json"))
    if committed["frames"] != frames:
        print("MISMATCH vs committed json:")
        print(json.dumps(frames, indent=1))
        return 1
    print("fixture regenerated, recon hashes match committed json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
