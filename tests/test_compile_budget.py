"""Compile-budget regression gate (round-4 postmortem).

Round 4's monolithic jitted encode program took >8 minutes to
trace+compile on this host's CPU backend, timing out the multichip
dryrun, the benchmark warmup and the test suite at once. The round-5
staged pipeline keeps every stage program small (sub-second trace,
seconds of XLA compile); this test pins that property so it cannot
silently regress: it bounds the *trace+lower* wall time and the lowered
StableHLO text size of every stage at the canonical 128x96 speed-0
config. (Lowered-text size is a compile-cost proxy immune to the
persistent compilation cache; the measured baselines are ~0.2-1.3 s and
0.1-0.6 MChars — thresholds sit at ~2.5x those.)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from h264lab_tpu.models import mbscan, refstate, wavefront
from h264lab_tpu.ops import bitpack

MBW, MBH = 8, 6
NMB = MBW * MBH
LOWER_S = 15.0            # per-stage trace+lower wall bound (2-core host)


@pytest.fixture(scope="module")
def stage_inputs():
    rng = np.random.default_rng(0)
    r = np.arange(NMB) // MBW
    c = np.arange(NMB) % MBW
    plan = wavefront.make_plan(MBW, MBH, slope=2)
    src_y = jnp.asarray(rng.integers(0, 256, (NMB, 16, 16), dtype=np.uint8))
    src_u = jnp.asarray(rng.integers(0, 256, (NMB, 8, 8), dtype=np.uint8))
    src_v = jnp.asarray(rng.integers(0, 256, (NMB, 8, 8), dtype=np.uint8))
    ref = refstate.prepare_reference(src_y, src_u, src_v, MBW, MBH)
    return dict(src=(src_y, src_u, src_v), ref=ref,
                steps=jnp.asarray(plan.steps),
                a_top=jnp.asarray(r > 0), a_left=jnp.asarray(c > 0),
                qp=jnp.int32(30), z=jnp.zeros((NMB,), jnp.int32))


def _lower(fn, *args, max_chars, **kw):
    t0 = time.time()
    lowered = jax.jit(fn, **kw).lower(*args)
    dt = time.time() - t0
    n = len(lowered.as_text())
    assert dt < LOWER_S, f"trace+lower took {dt:.1f}s (bound {LOWER_S}s)"
    assert n < max_chars, (
        f"lowered HLO grew to {n:,} chars (bound {max_chars:,}) — "
        "compile cost is superlinear in program size; keep stages small "
        "(fori_loop sweeps, no unrolled per-block bodies)")


def test_stage_programs_stay_small(stage_inputs):
    si = stage_inputs
    src_y, src_u, src_v = si["src"]
    ref = si["ref"]
    qp, z = si["qp"], si["z"]

    _lower(functools.partial(
        mbscan.inter_stage_core, mb_width=MBW, mb_height=MBH,
        enable_partitions=True, enable_qpel=True),
        src_y, src_u, src_v, ref["y_pad"], ref["u_pad"], ref["v_pad"],
        ref["y4_pad"], qp, qp, jnp.int32(0), z, z, max_chars=1_500_000)

    inter = mbscan.inter_stage(
        src_y, src_u, src_v, ref["y_pad"], ref["u_pad"], ref["v_pad"],
        ref["y4_pad"], qp, qp, jnp.int32(0), z, z,
        mb_width=MBW, mb_height=MBH,
        enable_partitions=True, enable_qpel=True)
    _lower(functools.partial(
        mbscan.select_stage_core, mb_width=MBW, mb_height=MBH,
        has_inter=True, enable_i4x4=True),
        src_y, src_u, src_v, qp, qp, si["steps"], si["a_top"],
        si["a_left"], inter, max_chars=800_000)

    st = mbscan.select_stage(
        src_y, src_u, src_v, qp, qp, si["steps"], si["a_top"],
        si["a_left"], inter, mb_width=MBW, mb_height=MBH,
        has_inter=True, enable_i4x4=True)
    _lower(functools.partial(
        mbscan.symbolize, mb_width=MBW, mb_height=MBH, has_inter=True),
        st["sel"], st["mode16"], st["cmode"], st["i4modes"],
        st["i4sym_v"], st["i4sym_l"], st["mv4_y"], st["mv4_x"],
        st["shape"], st["dc_lev"], st["ac_lev"], st["lev_inter"],
        st["cdc_lev"], st["cac_lev"], max_chars=1_500_000)

    _lower(functools.partial(
        mbscan.deblock_stage_core, mb_width=MBW, mb_height=MBH),
        st["recon_y"], st["recon_u"], st["recon_v"], st["sel"],
        st["lev_inter"], st["mv4_y"], st["mv4_x"], qp, qp,
        si["a_top"], si["a_left"], max_chars=900_000)

    _lower(functools.partial(
        bitpack.pack_frame_fast.__wrapped__, cap_words=1024),
        jnp.zeros((NMB, 28 * 34), jnp.uint32),
        jnp.zeros((NMB, 28 * 34), jnp.int32), max_chars=300_000)
