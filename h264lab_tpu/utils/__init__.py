"""Host-side utilities: YUV I/O, PSNR metrics, synthetic inputs, native ext."""

from h264lab_tpu.utils.yuv import YuvReader, YuvWriter, read_yuv_frames
from h264lab_tpu.utils.metrics import PsnrAccumulator, psnr
from h264lab_tpu.utils.synthetic import chessboard_frame, chessboard_sequence

__all__ = [
    "YuvReader",
    "YuvWriter",
    "read_yuv_frames",
    "PsnrAccumulator",
    "psnr",
    "chessboard_frame",
    "chessboard_sequence",
]
