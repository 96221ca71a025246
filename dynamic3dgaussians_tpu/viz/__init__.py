"""Visualization and export: npz/PLY checkpoints, offline renders."""
