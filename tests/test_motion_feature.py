"""Motion-basis trainer + feature-field supervision + utils tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.data import synthetic
from dynamic3dgaussians_tpu.ops import quat
from dynamic3dgaussians_tpu.train.config import RasterSettings, TrainConfig
from dynamic3dgaussians_tpu.train.motion_trainer import train_motion
from dynamic3dgaussians_tpu.train.trainer import train
from dynamic3dgaussians_tpu.utils import image_utils as IU

RS = RasterSettings(chunk=64, max_per_tile=256, max_tiles_per_gaussian=64,
                    pairs_per_gaussian=16)


def test_rotmat_to_quat_roundtrip():
    rng = np.random.RandomState(0)
    q = quat.normalize(jnp.asarray(rng.normal(size=(64, 4)), jnp.float32))
    R = quat.quat_to_rotmat(q)
    q2 = quat.rotmat_to_quat(R)
    # q and -q are the same rotation
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q2 * sign), np.asarray(q),
                               atol=1e-4)


def test_motion_trainer_improves():
    scene = synthetic.make_gt_scene(n_fg=40, n_bg=60, seed=1)
    dataset, w2c, _ = synthetic.make_dataset(scene, num_t=3, num_cams=3,
                                             w=48, h=32, f=40.0)
    pt = synthetic.init_point_cloud(scene, noise=0.02)
    cfg = TrainConfig(raster=RS, capacity=128, report_every=20)
    logs = []
    params, variables = train_motion(
        dataset, cfg, pt, w2c, num_bases=4, num_iters=120,
        callbacks={"on_step": lambda t, i, m: logs.append(
            (float(m["loss"]), float(m["psnr"])))})
    assert np.isfinite([l[0] for l in logs]).all()
    assert logs[-1][0] < logs[0][0]  # loss decreased
    assert params["motion_rots"].shape == (4, 3, 6)
    # background stays pinned: label==0 gaussians keep canonical positions
    from dynamic3dgaussians_tpu.train.motion_trainer import posed_gaussians
    posed0 = posed_gaussians(params, jnp.int32(0))
    posed2 = posed_gaussians(params, jnp.int32(2))
    bg = np.asarray(params["label"]) < 0.5
    np.testing.assert_allclose(np.asarray(posed0["means3D"])[bg],
                               np.asarray(posed2["means3D"])[bg])


def test_feature_field_training():
    """Per-gaussian semantic features fit a GT feature map."""
    scene = synthetic.make_gt_scene(n_fg=30, n_bg=50, seed=2)
    dataset, w2c, _ = synthetic.make_dataset(scene, num_t=1, num_cams=3,
                                             w=48, h=32, f=40.0)
    # fabricate a GT feature map: downsampled seg-derived 8-dim features
    for frames in dataset:
        for fr in frames:
            seg = np.asarray(fr["seg"])[..., 0]
            gt = np.stack([seg, 1 - seg] + [seg * 0.5] * 6, axis=-1)
            fr["gt_feature"] = jnp.asarray(gt[::2, ::2])  # coarser than image
    pt = synthetic.init_point_cloud(scene, noise=0.02)
    cfg = TrainConfig(num_timesteps=1, iters_first_timestep=60,
                      densify_start=10 ** 9, raster=RS, capacity=128,
                      semantic_dim=8, report_every=20)
    logs = []
    out, params, variables = train(
        dataset, cfg, pt, w2c,
        callbacks={"on_step": lambda t, i, m: logs.append(
            {k: float(v) for k, v in m.items()})})
    assert "loss_feature" in logs[0]
    assert np.isfinite([l["loss_feature"] for l in logs]).all()
    assert logs[-1]["loss_feature"] < logs[0]["loss_feature"]


def test_feature_pca_and_edges():
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.rand(16, 16, 8), jnp.float32)
    rgb, basis = IU.feature_pca(feat)
    assert rgb.shape == (16, 16, 3) and basis.shape == (8, 3)
    rgb2, _ = IU.feature_pca(feat, basis=basis)
    np.testing.assert_allclose(np.asarray(rgb2), np.asarray(rgb), atol=1e-5)
    img = jnp.zeros((16, 16)).at[:, 8:].set(1.0)
    e = IU.sobel_edges(img)
    assert float(e[8, 8]) > 1.0  # strong vertical edge
    assert float(e[8, 2]) < 1e-6


def test_depth_to_normal_flat_plane():
    depth = jnp.full((16, 16), 3.0)
    n = IU.depth_to_normal(depth, 50.0, 50.0)
    np.testing.assert_allclose(np.asarray(n[4:-4, 4:-4]),
                               np.tile([0, 0, 1.0], (8, 8, 1)), atol=1e-5)


def test_label_colormap():
    cm = IU.label_colormap()
    assert cm.shape == (256, 3)
    np.testing.assert_array_equal(cm[0], [0, 0, 0])
    np.testing.assert_array_equal(cm[1], [128, 0, 0])  # VOC class 1


def test_reverse_window_schedule():
    from dynamic3dgaussians_tpu.train.motion_trainer import (
        reverse_window_schedule)
    sched = list(reverse_window_schedule(12, step=3, window=6))
    anchors = [a for a, _ in sched]
    assert anchors == [11, 8, 5, 2]           # reversed, stride 3
    assert sched[0][1] == [11]                # clipped at the sequence end
    assert sched[2][1] == [5, 6, 7, 8, 9, 10]
    assert all(0 <= f < 12 for _, fs in sched for f in fs)


def test_procrustes_init_recovers_piecewise_rigid_motion():
    """dyn_som.py parity: two clusters moving with different SE(3)
    trajectories; the batched weighted-Procrustes init must recover
    transforms that replay the tracks and coefficients that separate the
    clusters."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dynamic3dgaussians_tpu.models.motion_bases import (
        apply_transforms, compute_transforms,
        init_motion_params_with_procrustes)
    from dynamic3dgaussians_tpu.ops.quat import cont_6d_to_rotmat

    rng = np.random.RandomState(0)
    f, n_half = 12, 120
    base_a = rng.uniform(-0.5, 0.5, (n_half, 3)) + np.array([2.0, 0, 0])
    base_b = rng.uniform(-0.5, 0.5, (n_half, 3)) + np.array([-2.0, 0, 0])

    def rigid_traj(base, axis, rate, vel):
        out = []
        for t in range(f):
            ang = rate * t
            c, s = np.cos(ang), np.sin(ang)
            if axis == "z":
                R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            else:
                R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
            out.append(base @ R.T + np.asarray(vel) * t)
        return np.stack(out, 1)                     # (N, F, 3)

    tracks = np.concatenate([
        rigid_traj(base_a, "z", 0.05, [0.02, 0, 0]),
        rigid_traj(base_b, "x", -0.04, [0, 0.03, 0])], 0).astype(np.float32)
    tracks += rng.normal(0, 1e-3, tracks.shape).astype(np.float32)

    bases, coefs, valid = init_motion_params_with_procrustes(
        jnp.asarray(tracks), num_bases=2, cano_t=0,
        key=jax.random.PRNGKey(0))
    assert bases["rots"].shape == (2, f, 6)
    assert coefs.shape == (2 * n_half, 2)
    assert int(valid.sum()) > 2 * n_half * 0.9

    # each basis replays its cluster's motion: apply the per-basis rigid
    # transform (no blending) to the canonical points
    R = cont_6d_to_rotmat(bases["rots"])            # (2, F, 3, 3)
    t = bases["transls"]
    err = []
    for k, base in enumerate([tracks[:n_half], tracks[n_half:]]):
        cano = base[:, 0]                           # (N, 3)
        pred = np.einsum("fij,nj->nfi", np.asarray(R[k]), cano) + \
            np.asarray(t[k])[None]
        alt = np.einsum("fij,nj->nfi", np.asarray(R[1 - k]), cano) + \
            np.asarray(t[1 - k])[None]
        e_own = np.abs(pred - base).max()
        e_other = np.abs(alt - base).max()
        err.append((e_own, e_other))
        assert e_own < 2e-2, (k, e_own)
        assert e_other > 5 * e_own, (k, e_own, e_other)

    # blended transforms through the standard API stay close too (coefs
    # strongly favor the own cluster at these separations)
    cn = coefs / jnp.maximum(coefs.sum(-1, keepdims=True), 1e-9)
    T = compute_transforms(bases, jnp.arange(f), cn)
    moved = apply_transforms(T, jnp.asarray(tracks[:, 0]))
    assert float(jnp.abs(moved - tracks).mean()) < 5e-2


def test_lift_tracks_to_3d_roundtrip():
    """Tracks on a dense analytic depth surface lift back to the exact 3D
    points (validates bilinear depth sampling + unprojection + c2w chain)."""
    import numpy as np
    from dynamic3dgaussians_tpu.data.tracks import lift_tracks_to_3d

    rng = np.random.RandomState(0)
    n, t, h, w = 80, 4, 48, 64
    k = np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]], np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    c2ws, depths = [], []
    for ti in range(t):
        ang = 0.05 * ti
        c, s_ = np.cos(ang), np.sin(ang)
        w2c = np.array([[c, 0, -s_, 0.1 * ti], [0, 1, 0, 0],
                        [s_, 0, c, 0], [0, 0, 0, 1]], np.float32)
        c2ws.append(np.linalg.inv(w2c).astype(np.float32))
        # smooth analytic surface in view space
        depths.append((4.0 + 0.01 * xx + 0.02 * yy
                       + 0.2 * np.sin(0.1 * xx) * (1 + 0.1 * ti))
                      .astype(np.float32))
    depths = np.stack(depths)

    # random subpixel track positions; ground truth = bilinear depth there
    tracks = np.zeros((n, t, 4), np.float32)
    tracks[..., 0] = rng.uniform(1, w - 2, (n, t))
    tracks[..., 1] = rng.uniform(1, h - 2, (n, t))
    tracks[..., 3] = 0.1
    pts_true = np.zeros((n, t, 3), np.float32)
    for ti in range(t):
        px, py = tracks[:, ti, 0], tracks[:, ti, 1]
        x0, y0 = np.floor(px).astype(int), np.floor(py).astype(int)
        fx_, fy_ = px - x0, py - y0
        d = depths[ti]
        z = ((1 - fy_) * ((1 - fx_) * d[y0, x0] + fx_ * d[y0, x0 + 1])
             + fy_ * ((1 - fx_) * d[y0 + 1, x0] + fx_ * d[y0 + 1, x0 + 1]))
        xc = (px - k[0, 2]) / k[0, 0] * z
        yc = (py - k[1, 2]) / k[1, 1] * z
        pc = np.stack([xc, yc, z, np.ones_like(z)], -1)
        pts_true[:, ti] = (pc @ np.asarray(c2ws[ti]).T)[:, :3]

    t3d, vis, conf = lift_tracks_to_3d(tracks, depths, k, np.stack(c2ws))
    assert vis.all()
    err = np.linalg.norm(t3d - pts_true, axis=-1)
    assert err.max() < 1e-3, err.max()
    assert (conf > 0.8).all()

    # occlusion flag (channel 2) kills visibility
    tracks[:5, :, 2] = 1.0
    _, vis2, conf2 = lift_tracks_to_3d(tracks, depths, k, np.stack(c2ws))
    assert not vis2[:5].any() and vis2[5:].all()
    assert (conf2[:5] == 0).all()


def test_train_motion_with_procrustes_tracks():
    """tracks_3d switches train_motion to the procrustes init and the loss
    still optimizes (dyn_som -> dyn_train integration)."""
    import jax.numpy as jnp
    import numpy as np
    from dynamic3dgaussians_tpu.data import synthetic
    from dynamic3dgaussians_tpu.train.config import (RasterSettings,
                                                     TrainConfig)
    from dynamic3dgaussians_tpu.train.motion_trainer import train_motion

    scene = synthetic.make_gt_scene(n_fg=20, n_bg=30, seed=0)
    num_t = 4
    dataset, w2c, _ = synthetic.make_dataset(scene, num_t=num_t, num_cams=2,
                                             w=32, h=32, f=28.0)
    pt = synthetic.init_point_cloud(scene, noise=0.02)
    # tracks = animated GT positions of the fg points
    tracks = np.stack([synthetic.animate(scene, t, num_t)
                       for t in range(num_t)], axis=1)   # (N, T, 3)
    cfg = TrainConfig(capacity=64, seed=0, report_every=5,
                      raster=RasterSettings(chunk=64, max_per_tile=256,
                                            max_tiles_per_gaussian=16,
                                            pairs_per_gaussian=16))
    losses = []
    params, variables = train_motion(
        dataset, cfg, pt, w2c, num_bases=4, num_iters=20,
        tracks_3d=tracks[:40],
        callbacks={"on_step": lambda t, i, m: losses.append(
            float(m["loss"]))})
    assert "motion_rots" in params and params["motion_rots"].shape[1] == num_t
    assert np.isfinite(losses).all()
    assert losses[-1] <= losses[0] * 1.2


def test_tracks_from_sequence_files(tmp_path):
    """load_2d_tracks/tracks_from_sequence read the reference's on-disk
    layout ({query}_{target}.npy) and lift through the full pipeline."""
    import numpy as np
    from dynamic3dgaussians_tpu.data.tracks import tracks_from_sequence

    rng = np.random.RandomState(0)
    names = ["f0", "f1", "f2"]
    t, h, w = 3, 24, 32
    k = np.array([[20.0, 0, 16], [0, 20.0, 12], [0, 0, 1]], np.float32)
    depths = np.full((t, h, w), 5.0, np.float32)
    c2ws = np.tile(np.eye(4, dtype=np.float32)[None], (t, 1, 1))
    for q in names:
        for tn in names:
            arr = np.zeros((7, 4), np.float32)
            arr[:, 0] = rng.uniform(2, w - 3, 7)
            arr[:, 1] = rng.uniform(2, h - 3, 7)
            arr[:, 3] = 0.2
            np.save(tmp_path / f"{q}_{tn}.npy", arr)
    t3d, vis, conf = tracks_from_sequence(
        str(tmp_path), names, depths, k, c2ws, num_samples=12)
    assert t3d.shape == (12, 3, 3)   # capped at 12 samples (4 per query)
    assert vis.all() and (conf > 0.5).all()
    np.testing.assert_allclose(t3d[..., 2], 5.0, atol=1e-5)
