"""Device compute kernels (JAX/XLA/Pallas), batched over macroblocks.

This layer is the TPU-native equivalent of the reference's VFT kernel
table (`src/h264-lab.h:3274-3366`): every pixel/DSP kernel the C encoder
dispatches per-macroblock is re-designed here as a batched tensor op over
`(n_mb, …)` arrays, jit-compiled and fused by XLA. One Pallas kernel
ships (the bit-pack stitch in `bitpack.py`; interpret-validated — this
environment's tunneled TPU cannot execute Pallas programs, so the XLA
formulation stays the default dispatch path).
"""
