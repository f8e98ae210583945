"""Scalar numpy golden models for the device kernels.

Written directly from ITU-T H.264 spec pseudo-code as an *independent*
implementation: kernel tests compare the batched JAX ops against these
per-block scalar routines.
"""

from __future__ import annotations

import numpy as np

from h264lab_tpu.ops import tables

CF = np.array([[1, 1, 1, 1],
               [2, 1, -1, -2],
               [1, -1, -1, 1],
               [1, -2, 2, -1]], dtype=np.int64)


def fdct4x4(res: np.ndarray) -> np.ndarray:
    return (CF @ res.astype(np.int64) @ CF.T).astype(np.int32)


def idct4x4(coef: np.ndarray) -> np.ndarray:
    """Spec 8.5.12.2 scalar inverse with interleaved shifts."""
    d = coef.astype(np.int64)
    tmp = np.zeros((4, 4), dtype=np.int64)
    for i in range(4):
        d0, d1, d2, d3 = d[i, 0], d[i, 1], d[i, 2], d[i, 3]
        e0 = d0 + d2
        e1 = d0 - d2
        e2 = (d1 >> 1) - d3
        e3 = d1 + (d3 >> 1)
        tmp[i] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    out = np.zeros((4, 4), dtype=np.int64)
    for j in range(4):
        f0, f1, f2, f3 = tmp[0, j], tmp[1, j], tmp[2, j], tmp[3, j]
        g0 = f0 + f2
        g1 = f0 - f2
        g2 = (f1 >> 1) - f3
        g3 = f1 + (f3 >> 1)
        out[:, j] = [g0 + g3, g1 + g2, g1 - g2, g0 - g3]
    return ((out + 32) >> 6).astype(np.int32)


def quant4x4(coef: np.ndarray, qp: int, deadzone_q8: int) -> np.ndarray:
    mf = tables.QUANT_MF[qp % 6][tables.POS_CLASS].reshape(4, 4).astype(np.int64)
    qbits = 15 + qp // 6
    f = (deadzone_q8 << qbits) >> 8
    w = coef.astype(np.int64)
    mag = (np.abs(w) * mf + f) >> qbits
    return (np.sign(w) * mag).astype(np.int32)


def dequant4x4(level: np.ndarray, qp: int) -> np.ndarray:
    v = tables.DEQUANT_V[qp % 6][tables.POS_CLASS].reshape(4, 4).astype(np.int64)
    return ((level.astype(np.int64) * v) << (qp // 6)).astype(np.int32)


H4 = np.array([[1, 1, 1, 1],
               [1, 1, -1, -1],
               [1, -1, -1, 1],
               [1, -1, 1, -1]], dtype=np.int64)


def hadamard4x4(x: np.ndarray) -> np.ndarray:
    return (H4 @ x.astype(np.int64) @ H4.T).astype(np.int32)


def quant_luma_dc(dc: np.ndarray, qp: int) -> np.ndarray:
    f = hadamard4x4(dc).astype(np.int64)
    mf00 = int(tables.QUANT_MF[qp % 6, 0])
    qbits = 17 + qp // 6
    mag = (np.abs(f) * mf00 + (1 << (qbits - 1))) >> qbits
    return (np.sign(f) * mag).astype(np.int32)


def dequant_luma_dc(level: np.ndarray, qp: int) -> np.ndarray:
    f = hadamard4x4(level).astype(np.int64)
    v00 = int(tables.DEQUANT_V[qp % 6, 0])
    div6 = qp // 6
    if div6 >= 2:
        out = (f * v00) << (div6 - 2)
    else:
        out = (f * v00 + (1 << (1 - div6))) >> (2 - div6)
    return out.astype(np.int32)


H2 = np.array([[1, 1], [1, -1]], dtype=np.int64)


def hadamard2x2(x: np.ndarray) -> np.ndarray:
    return (H2 @ x.astype(np.int64) @ H2.T).astype(np.int32)


def quant_chroma_dc(dc: np.ndarray, qpc: int) -> np.ndarray:
    f = hadamard2x2(dc).astype(np.int64)
    mf00 = int(tables.QUANT_MF[qpc % 6, 0])
    qbits = 16 + qpc // 6
    mag = (np.abs(f) * mf00 + (1 << (qbits - 1))) >> qbits
    return (np.sign(f) * mag).astype(np.int32)


def dequant_chroma_dc(level: np.ndarray, qpc: int) -> np.ndarray:
    f = hadamard2x2(level).astype(np.int64)
    v00 = int(tables.DEQUANT_V[qpc % 6, 0])
    return (((f * v00) << (qpc // 6)) >> 1).astype(np.int32)
