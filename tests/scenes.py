"""Shared synthetic scene builders for tests."""

from __future__ import annotations

import numpy as np

from dynamic3dgaussians_tpu.ops.camera import make_camera


def random_scene(n=200, seed=0, spread=1.0, scale_lo=0.02, scale_hi=0.12):
    rng = np.random.RandomState(seed)
    means = rng.uniform(-spread, spread, (n, 3))
    colors = rng.uniform(0, 1, (n, 3))
    opac = rng.uniform(0.2, 0.95, (n,))
    scales = rng.uniform(scale_lo, scale_hi, (n, 3))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return (means.astype(np.float32), colors.astype(np.float32),
            opac.astype(np.float32), scales.astype(np.float32),
            quats.astype(np.float32))


def lookat_camera(w=64, h=48, f=60.0, dist=4.0):
    """Camera on -z looking at the origin (w2c = translate by dist along z)."""
    w2c = np.eye(4, dtype=np.float64)
    w2c[2, 3] = dist
    k = np.array([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1.0]])
    return make_camera(w, h, k, w2c, near=0.01, far=100.0), k, w2c
