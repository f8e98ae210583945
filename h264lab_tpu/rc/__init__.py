"""Rate control and VBV buffer model (reference src/h264-lab.h:5815-6180)."""
