"""Flow priors, offline feature pipeline, LPIPS, spectral clustering, tools."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.data import features as F
from dynamic3dgaussians_tpu.data import tools
from dynamic3dgaussians_tpu.eval.lpips import (
    lpips_fn, random_features_params)
from dynamic3dgaussians_tpu.models.motion_bases import (
    coefs_from_feature_clusters, spectral_cluster)
from dynamic3dgaussians_tpu.train import flow as FL


def test_warp_and_compose_consistency():
    # constant flow (2, -1): composing two halves equals one full warp
    h, w = 16, 20
    full = jnp.full((h, w, 2), jnp.asarray([2.0, -1.0]))
    half = full / 2
    comp = FL.compose_flows(half, half)
    # interior pixels exact; border pixels clamp
    np.testing.assert_allclose(np.asarray(comp[2:-2, 2:-2]),
                               np.asarray(full[2:-2, 2:-2]), atol=1e-5)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(h, w, 3), jnp.float32)
    shifted = FL.warp_image(img, jnp.zeros((h, w, 2)))
    np.testing.assert_allclose(np.asarray(shifted), np.asarray(img),
                               atol=1e-6)


def test_flow_consistency_and_trimmed_mse():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(8, 8, 2), jnp.float32)
    assert float(FL.flow_consistency_loss(a, a)) < 1e-10
    err = jnp.zeros((100,)).at[0].set(100.0)  # one huge outlier
    assert float(FL.trimmed_mse(err, trim=0.05)) == 0.0


def test_render_flow_matches_projection_shift(tmp_path):
    from tests.scenes import lookat_camera
    cam, _, _ = lookat_camera(w=32, h=32, f=40.0, dist=4.0)
    n = 20
    rng = np.random.RandomState(2)
    means0 = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    means1 = means0 + jnp.asarray([0.1, 0.0, 0.0])
    colors = jnp.ones((n, 3), jnp.float32)
    opac = jnp.full((n,), 0.9, jnp.float32)
    scales = jnp.full((n, 3), 0.08, jnp.float32)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    fl = FL.render_flow(cam, means0, means1, colors, opac, scales, quats,
                        method="tiled")
    # moving +x in world space in front of the camera moves +x on screen
    a = np.asarray(fl)
    covered = np.asarray(
        jnp.linalg.norm(fl, axis=-1) > 0.1)
    assert covered.any()
    assert a[..., 0][covered].mean() > 1.0  # pixels of positive x-flow


def test_feature_pyramid_and_pca(tmp_path):
    rng = np.random.RandomState(0)
    imgs = [rng.rand(32, 40, 3).astype(np.float32) for _ in range(3)]

    def fake_extract(crop):  # 4x4 patches, 8-dim features from mean color
        h, w = crop.shape[:2]
        f = crop[: h // 4 * 4, : w // 4 * 4].reshape(
            h // 4, 4, w // 4, 4, 3).mean((1, 3))
        return np.concatenate([f, f * 0.5, f * 0.25 - 0.1,
                               np.roll(f, 1, -1) * 0.3], axis=-1)[..., :8]

    boxes = F.multicrop_boxes(32, 40, 24, overlap=0.5)
    assert (0, 0) in boxes and (8, 16) in boxes
    pca = F.extract_sequence(imgs, fake_extract, str(tmp_path), out_dim=4,
                             crop_sizes=(24,), out_hw=(16, 20))
    fm = F.load_feature_map(str(tmp_path), 0)
    assert fm.shape == (16, 20, 4)
    assert os.path.exists(os.path.join(str(tmp_path), "pca.pkl"))
    pca2 = F.GlobalPCA.load(os.path.join(str(tmp_path), "pca.pkl"))
    np.testing.assert_allclose(pca2.components, pca.components)


def test_lpips_basic_properties():
    params = random_features_params()
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(64, 64, 3), jnp.float32)
    b = jnp.asarray(rng.rand(64, 64, 3), jnp.float32)
    same = float(lpips_fn(params, a, a))
    diff = float(lpips_fn(params, a, b))
    assert same < 1e-10 and diff > same
    # masked: differences outside the mask are ignored
    mask = jnp.zeros((64, 64)).at[:32].set(1.0)
    b_masked_same = jnp.where(mask[..., None] > 0, a, b)
    assert float(lpips_fn(params, b_masked_same, a, mask=mask)) < 1e-8


def test_spectral_cluster_separates_blobs():
    rng = np.random.RandomState(0)
    f = np.concatenate([rng.randn(40, 6) + 4, rng.randn(40, 6) - 4])
    centers, labels = spectral_cluster(jnp.asarray(f, jnp.float32), 2,
                                       jax.random.PRNGKey(0))
    l = np.asarray(labels)
    purity = max(np.mean(l[:40] == l[0]), np.mean(l[:40] != l[0]))
    assert purity > 0.9
    coefs = coefs_from_feature_clusters(jnp.asarray(f, jnp.float32), 2,
                                        jax.random.PRNGKey(1))
    assert coefs.shape == (80, 2) and np.isfinite(np.asarray(coefs)).all()


def test_data_tools(tmp_path):
    rng = np.random.RandomState(0)
    frames = [(rng.rand(16, 16, 3) * 255).astype(np.uint8) for _ in range(4)]
    fdir = tmp_path / "frames"
    os.makedirs(fdir)
    from PIL import Image
    for i, f in enumerate(frames):
        Image.fromarray(f).save(fdir / f"{i:03d}.png")
    out = tools.frames_to_video(str(fdir), str(tmp_path / "v.gif"), fps=5)
    assert os.path.exists(out)
    np.savez(tmp_path / "p.npz", a=np.zeros((3, 2)), b=np.ones(5))
    rep = tools.inspect_npz(str(tmp_path / "p.npz"))
    assert rep["a"]["shape"] == (3, 2) and rep["b"]["max"] == 1.0
    masks = [np.zeros((16, 16)) for _ in frames]
    masks[0][:8] = 1.0
    stats = tools.verify_masks(frames, masks, out_dir=str(tmp_path / "ov"))
    assert abs(stats["max_coverage"] - 0.5) < 1e-6 and stats["n"] == 4
