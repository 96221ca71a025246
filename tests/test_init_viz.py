"""Init-cloud strategies + headless visualization additions."""

import numpy as np

from dynamic3dgaussians_tpu.data import init_clouds as IC
from dynamic3dgaussians_tpu.viz import render as VR
from tests.scenes import lookat_camera


def test_depth_unprojection_roundtrip():
    # constant-depth plane seen by an identity camera reprojects exactly
    h, w, f = 24, 32, 40.0
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    depth = np.full((h, w), 2.5)
    rgb = np.random.RandomState(0).rand(h, w, 3)
    cloud = IC.from_depth_maps([depth], [rgb], [k], [np.eye(4)], stride=1)
    assert cloud.shape == (h * w, 7)
    np.testing.assert_allclose(cloud[:, 2], 2.5, atol=1e-6)
    # camera at z=-1 looking forward: world z = 2.5 - 1? (w2c translate)
    w2c = np.eye(4)
    w2c[2, 3] = 1.0  # world -> cam adds 1 to z, so world z = 1.5
    cloud2 = IC.from_depth_maps([depth], [rgb], [k], [w2c], stride=1)
    np.testing.assert_allclose(cloud2[:, 2], 1.5, atol=1e-6)


def test_init_type_dispatch():
    rng = np.random.RandomState(0)
    base = rng.rand(100, 7).astype(np.float32)
    noisy = IC.build_init_cloud("noise", pt_cld=base, noise_factor=3,
                                noise_sigma=0.01)
    assert noisy.shape[0] == 300
    np.testing.assert_allclose(noisy[:100], base)
    sub = IC.build_init_cloud("pcd", pt_cld=base, max_points=40)
    assert sub.shape[0] == 40
    ckpt = {"means3D": rng.rand(3, 50, 3), "rgb_colors": rng.rand(3, 50, 3),
            "seg_colors": rng.rand(50, 3)}
    c = IC.build_init_cloud("checkpoint", checkpoint=ckpt)
    assert c.shape == (50, 7)


def _stacked(num_t=4, n=30, seed=0):
    rng = np.random.RandomState(seed)
    means = rng.uniform(-0.5, 0.5, (num_t, n, 3)).astype(np.float32)
    return {
        "means3D": means,
        "rgb_colors": rng.rand(n, 3).astype(np.float32),
        "seg_colors": np.stack([np.ones(n), np.zeros(n), np.zeros(n)],
                               -1).astype(np.float32),
        "unnorm_rotations": np.tile(np.array([1, 0, 0, 0], np.float32),
                                    (num_t, n, 1)),
        "logit_opacities": np.zeros((n, 1), np.float32),
        "log_scales": np.full((n, 3), -3.0, np.float32),
    }


def test_rotation_lines_and_draw():
    stacked = _stacked()
    segs = VR.rotation_vector_lines(stacked, t=2, stride=1)
    assert segs.shape[1:] == (2, 3) and segs.shape[0] == 30
    cam, _, _ = lookat_camera(w=64, h=48, f=50.0, dist=4.0)
    img = VR.draw_lines(np.zeros((48, 64, 3), np.uint8), segs, cam)
    assert (img > 0).any()


def test_rgbd_to_pointcloud():
    h, w, f = 16, 20, 30.0
    k = [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]]
    depth = np.full((h, w), 3.0)
    rgb = np.random.RandomState(1).rand(h, w, 3)
    alpha = np.ones((h, w))
    alpha[:4] = 0.0  # cut the top rows
    pts, cols = VR.rgbd_to_pointcloud(rgb, depth, k, alpha)
    assert pts.shape[0] == (h - 4) * w
    np.testing.assert_allclose(pts[:, 2], 3.0, atol=1e-6)


def test_playback_modes():
    stacked = _stacked()
    cam, _, _ = lookat_camera(w=32, h=32, f=30.0, dist=4.0)
    frames = list(VR.playback(stacked, cam, mode="color", max_frames=2,
                              show_trajectories=True, show_rotations=True))
    assert len(frames) == 2 and frames[0].shape == (32, 32, 3)
    dframes = list(VR.playback(stacked, cam, mode="depth", max_frames=1))
    assert dframes[0].dtype == np.uint8
