"""Generic utilities: logging, profiling, seeding, image ops, pose paths."""
