"""Evaluation metrics (masked image quality, tracking, pose)."""
