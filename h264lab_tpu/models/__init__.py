"""Encoder pipelines ("models"): the frame-level orchestration that turns
YUV frames into Annex-B bitstreams, built from the batched ops layer."""
