"""Metrics, checkpoint/PLY export roundtrips, motion bases, offline viz."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.eval import metrics as M
from dynamic3dgaussians_tpu.models import motion_bases as MB
from dynamic3dgaussians_tpu.viz import export as E
from dynamic3dgaussians_tpu.viz import render as VR


def test_masked_psnr():
    rng = np.random.RandomState(0)
    gt = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    pred = gt.copy()
    pred[:8] += 0.5  # corrupt top half
    mask = np.zeros((16, 16), np.float32)
    mask[8:] = 1
    full = float(M.masked_psnr(jnp.asarray(pred), jnp.asarray(gt)))
    masked = float(M.masked_psnr(jnp.asarray(pred), jnp.asarray(gt),
                                 jnp.asarray(mask)))
    assert masked > 60 > full


def test_pck_and_iou():
    gt = jnp.asarray([[10.0, 10], [50, 50], [90, 90]])
    pred = gt + jnp.asarray([[1.0, 0], [30, 0], [0, 1]])
    # thresh = 0.05 * 100 = 5 px -> 2 of 3 correct
    assert abs(float(M.pck(pred, gt, (100, 100))) - 2 / 3) < 1e-6
    a = jnp.zeros((10, 10)).at[:5].set(1.0)
    b = jnp.zeros((10, 10)).at[2:7].set(1.0)
    np.testing.assert_allclose(float(M.mask_iou(a, b)), 30 / 70, atol=1e-6)


def test_pose_metrics():
    rng = np.random.RandomState(1)
    gt = np.tile(np.eye(4)[None], (10, 1, 1))
    gt[:, :3, 3] = rng.normal(size=(10, 3))
    assert M.ate(gt, gt) < 1e-9
    t_err, r_err = M.rpe(gt, gt)
    assert t_err < 1e-9 and r_err < 1e-3
    shifted = gt.copy()
    shifted[:, :3, 3] += 5.0  # constant offset: ATE invariant, RPE invariant
    assert M.ate(shifted, gt) < 1e-6
    noisy = gt.copy()
    noisy[:, :3, 3] += rng.normal(0, 0.1, (10, 3))
    assert M.ate(noisy, gt) > 0.01


def test_params_npz_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    t0 = {"means3D": rng.rand(50, 3).astype(np.float32),
          "rgb_colors": rng.rand(50, 3).astype(np.float32),
          "seg_colors": rng.rand(50, 3).astype(np.float32),
          "unnorm_rotations": rng.rand(50, 4).astype(np.float32),
          "logit_opacities": rng.rand(50, 1).astype(np.float32),
          "log_scales": rng.rand(50, 3).astype(np.float32),
          "cam_m": np.zeros((5, 3), np.float32),
          "cam_c": np.zeros((5, 3), np.float32)}
    t1 = {k: t0[k] + 1 for k in ("means3D", "rgb_colors", "unnorm_rotations")}
    path = E.save_params([t0, t1, t1], str(tmp_path))
    loaded = E.load_params(path)
    # stacked keys get a leading T axis (reference helpers.py:158-167)
    assert loaded["means3D"].shape == (3, 50, 3)
    assert loaded["log_scales"].shape == (50, 3)
    np.testing.assert_allclose(loaded["means3D"][0], t0["means3D"])
    np.testing.assert_allclose(loaded["means3D"][1], t1["means3D"])


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    n = 40
    means = rng.rand(n, 3).astype(np.float32)
    ls = rng.rand(n, 3).astype(np.float32)
    rots = rng.rand(n, 4).astype(np.float32)
    rgbs = rng.rand(n, 3).astype(np.float32)
    ops = rng.rand(n, 1).astype(np.float32)
    path = E.save_ply_splat(str(tmp_path / "x.ply"), means, ls, rots, rgbs, ops)
    back = E.load_ply_splat(path)
    np.testing.assert_allclose(back["means3D"], means, atol=1e-6)
    np.testing.assert_allclose(back["rgb_colors"], rgbs, atol=1e-5)
    np.testing.assert_allclose(back["log_scales"], ls, atol=1e-6)
    np.testing.assert_allclose(back["unnorm_rotations"], rots, atol=1e-6)


def test_motion_bases_identity_blend():
    key = jax.random.PRNGKey(0)
    bases = MB.init_motion_bases(4, 10, key)
    bases["rots"] = jnp.tile(MB.rotmat_to_cont_6d(jnp.eye(3)), (4, 10, 1))
    bases["transls"] = jnp.zeros((4, 10, 3))
    coefs = jax.nn.softmax(jax.random.normal(key, (20, 4)))
    tf = MB.compute_transforms(bases, jnp.arange(3), coefs)
    assert tf.shape == (20, 3, 3, 4)
    np.testing.assert_allclose(np.asarray(tf[..., :3]),
                               np.tile(np.eye(3), (20, 3, 1, 1)), atol=1e-5)
    pts = jax.random.normal(key, (20, 3))
    moved = MB.apply_transforms(tf, pts)
    np.testing.assert_allclose(np.asarray(moved),
                               np.tile(np.asarray(pts)[:, None], (1, 3, 1)),
                               atol=1e-5)


def test_motion_bases_translation():
    key = jax.random.PRNGKey(1)
    bases = MB.init_motion_bases(2, 5, key)
    bases["rots"] = jnp.tile(MB.rotmat_to_cont_6d(jnp.eye(3)), (2, 5, 1))
    shift = jnp.asarray([1.0, 2.0, 3.0])
    bases["transls"] = jnp.tile(shift, (2, 5, 1))
    coefs = jnp.asarray([[0.5, 0.5]] * 7)
    tf = MB.compute_transforms(bases, jnp.arange(2), coefs)
    moved = MB.apply_transforms(tf, jnp.zeros((7, 3)))
    np.testing.assert_allclose(np.asarray(moved),
                               np.tile(shift, (7, 2, 1)), atol=1e-5)


def test_kmeans_coefs():
    rng = np.random.RandomState(4)
    feats = np.concatenate([rng.normal(0, 0.1, (30, 8)),
                            rng.normal(5, 0.1, (30, 8))]).astype(np.float32)
    coefs = MB.coefs_from_features(jnp.asarray(feats), 2,
                                   jax.random.PRNGKey(2))
    assert coefs.shape == (60, 2)
    # each point should strongly prefer one basis
    ratio = np.asarray(coefs.max(-1) / (coefs.min(-1) + 1e-9))
    assert (ratio > 10).mean() > 0.9


def test_viz_roundtrip(tmp_path):
    """Orbit-render a tiny checkpoint end to end (P11/P12 capability)."""
    rng = np.random.RandomState(5)
    n, T = 60, 2
    stacked = {
        "means3D": np.tile(rng.uniform(-1, 1, (1, n, 3)), (T, 1, 1))
        .astype(np.float32),
        "rgb_colors": np.tile(rng.uniform(0, 1, (1, n, 3)), (T, 1, 1))
        .astype(np.float32),
        "unnorm_rotations": np.tile(np.array([1.0, 0, 0, 0], np.float32),
                                    (T, n, 1)),
        "seg_colors": np.stack([np.ones(n), np.zeros(n), np.zeros(n)], -1)
        .astype(np.float32),
        "logit_opacities": np.ones((n, 1), np.float32),
        "log_scales": np.full((n, 3), np.log(0.05), np.float32),
    }
    stacked["means3D"][1] += 0.1
    frames = VR.orbit_render(stacked, n_frames=3, w=64, h=48, f=40.0)
    assert len(frames) == 3 and frames[0].shape == (48, 64, 3)
    assert frames[0].max() > 0  # something rendered
    gif = VR.save_gif(frames, str(tmp_path / "orbit.gif"), fps=5)
    assert os.path.getsize(gif) > 100
    segs = VR.trajectory_lines(stacked, t=1, traj_length=5, stride=10)
    assert segs.shape[1:] == (2, 3) and segs.shape[0] > 0
    d = VR.colormap_depth(np.ones((8, 8)), np.ones((8, 8)))
    assert d.shape == (8, 8, 3)

def test_spherify_and_spiral_paths():
    from dynamic3dgaussians_tpu.utils.pose_utils import (spherify_path,
                                                         spiral_path)
    from tests.scenes import lookat_camera
    cams = [lookat_camera(w=32, h=24, f=30.0, dist=3.0 + 0.2 * i)[0]
            for i in range(4)]
    sp = spherify_path(cams, n=12)
    assert len(sp) == 12
    # all spherified cameras sit at equal distance from the scene center
    import numpy as np
    centers = [np.linalg.inv(np.asarray(c.w2c))[:3, 3] for c in sp]
    d = [np.linalg.norm(c - np.mean(centers, 0)) for c in centers]
    assert np.std(d) / np.mean(d) < 0.35
    assert len(spiral_path(cams[0], n=10)) == 10


def test_mark_visible_and_debug_render(tmp_path):
    import jax.numpy as jnp
    import numpy as np
    from dynamic3dgaussians_tpu.ops.debug import mark_visible, render_debug
    from tests.scenes import lookat_camera, random_scene
    cam, _, _ = lookat_camera(w=32, h=32, f=30.0, dist=4.0)
    means, colors, opac, scales, quats = random_scene(40, seed=0)
    vis = mark_visible(cam, jnp.asarray(means))
    assert bool(vis.any())
    behind = jnp.asarray(means) - jnp.asarray([0.0, 0.0, 10.0])
    assert not bool(mark_visible(cam, behind).any())
    out, ok = render_debug(cam, jnp.asarray(means), jnp.asarray(colors),
                           jnp.asarray(opac), jnp.asarray(scales),
                           jnp.asarray(quats),
                           snapshot_path=str(tmp_path / "snap.npz"))
    assert ok and out.rgb.shape == (32, 32, 3)
    # force a bad input -> snapshot dump
    bad = jnp.asarray(means).at[0].set(jnp.nan)
    out, ok = render_debug(cam, bad, jnp.asarray(colors), jnp.asarray(opac),
                           jnp.asarray(scales), jnp.asarray(quats),
                           snapshot_path=str(tmp_path / "snap.npz"))
    import os
    assert os.path.exists(tmp_path / "snap.npz") or ok
