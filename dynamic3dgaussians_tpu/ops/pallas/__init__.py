"""Hand-written Pallas TPU kernels for the rasterizer hot path."""
