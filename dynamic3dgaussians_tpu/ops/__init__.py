"""Compute ops: geometry, projection, rasterization, kNN, SSIM."""
