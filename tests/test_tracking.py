"""6-DOF tracking-by-deformation: rigid scenes track exactly."""

import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.eval import tracking as TR
from dynamic3dgaussians_tpu.eval.metrics import pck
from tests.scenes import lookat_camera


def _rigid_stack(num_t=5, n=60, seed=0):
    """Gaussians moving rigidly: rotation about y + translation per step."""
    rng = np.random.RandomState(seed)
    base = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    means, rots = [], []
    for t in range(num_t):
        ang = 0.15 * t
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        shift = np.array([0.1 * t, 0.05 * t, 0.0], np.float32)
        means.append(base @ R.T + shift)
        # quaternion for rotation about y by ang (wxyz)
        rots.append(np.tile(np.array(
            [np.cos(ang / 2), 0, np.sin(ang / 2), 0], np.float32), (n, 1)))
    return {
        "means3D": np.stack(means),
        "unnorm_rotations": np.stack(rots),
        "seg_colors": np.stack([np.ones(n), np.zeros(n), np.zeros(n)],
                               -1).astype(np.float32),
        "rgb_colors": rng.rand(n, 3).astype(np.float32),
        "logit_opacities": np.full((n, 1), 2.0, np.float32),
        "log_scales": np.full((n, 3), -2.5, np.float32),
    }, base


def test_rigid_motion_tracks_exactly():
    stacked, base = _rigid_stack()
    queries = jnp.asarray(base[:10] + 0.03)  # near but not on gaussians
    tracks = TR.track_points_3d(stacked, queries, k=6)
    # ground truth: the same rigid transform applied to the queries
    for t in range(5):
        ang = 0.15 * t
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        gt = np.asarray(queries) @ R.T + np.array([0.1 * t, 0.05 * t, 0.0])
        np.testing.assert_allclose(np.asarray(tracks[t]), gt, atol=5e-3)


def test_rotation_tracks_match_rigid_rotation():
    stacked, base = _rigid_stack()
    q = TR.track_rotations(stacked, jnp.asarray(base[:5]), k=4)
    for t in range(5):
        ang = 0.15 * t
        expect = np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0])
        got = np.asarray(q[t])
        sign = np.sign(np.sum(got * expect, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sign, np.tile(expect, (5, 1)),
                                   atol=1e-4)


def test_pixel_tracking_end_to_end_pck():
    stacked, base = _rigid_stack()
    cam, _, _ = lookat_camera(w=64, h=64, f=60.0, dist=4.0)
    px = jnp.asarray([[32.0, 32.0], [28.0, 36.0], [40.0, 30.0]])
    tracks2d = TR.track_pixels(stacked, cam, px, k=6, method="tiled")
    assert tracks2d.shape == (5, 3, 2)
    # t=0 must reproject to the query pixels
    np.testing.assert_allclose(np.asarray(tracks2d[0]), np.asarray(px),
                               atol=1.5)
    # self-PCK at t=0 is 1
    assert float(pck(tracks2d[0], px, (64, 64), ratio=0.05)) == 1.0
    # motion moves the tracks
    assert np.abs(np.asarray(tracks2d[-1]) - np.asarray(px)).max() > 2.0
