"""RD ablation runner: one tuning configuration per invocation.

Reads `H264LAB_TUNE_*` overrides from the environment (see
h264lab_tpu/ops/tuning.py), runs the RD-parity ladder from
tests/test_rd_parity.py on CPU, and prints one summary line:

    <tag> worst=<dB> deltas=[...] kbps=[...]

Drive a grid with a shell loop; see RD_COMPARE.md for fitted results.
"""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "cfg"
    spec = importlib.util.spec_from_file_location(
        "rdc", os.path.join(os.path.dirname(__file__), "..",
                            "tests", "test_rd_parity.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    raw, frames = m._sequence_bytes()
    ref = m.run_reference_ladder(frames, raw)
    ours = m.run_ours_ladder(frames)
    rows = m.compare(ref, ours)
    worst = min(r["delta_db"] for r in rows)
    deltas = [round(r["delta_db"], 2) for r in rows]
    kbps = [round(r["our_kbps"], 1) for r in rows]
    tune = {k: v for k, v in os.environ.items()
            if k.startswith("H264LAB_TUNE_")}
    print(f"{tag} worst={worst:+.2f} deltas={deltas} kbps={kbps} "
          f"tune={tune}", flush=True)


if __name__ == "__main__":
    main()
