"""COLMAP bin<->txt conversion roundtrip + new loss primitives."""

import os
import struct

import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.data import colmap as C
from dynamic3dgaussians_tpu.train import losses as L


def _write_bin_model(d):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        # camera_id, model_id (1 = PINHOLE, 4 params), w, h
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        f.write(struct.pack("<dddd", 50.0, 50.0, 32.0, 24.0))
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<idddddddi", 1, 1.0, 0.0, 0.0, 0.0,
                            0.1, 0.2, 0.3, 1))
        f.write(b"im0.jpg\x00")
        f.write(struct.pack("<Q", 0))
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<QdddBBBd", i + 1, 1.0 * i, 2.0, 3.0,
                                10, 20, 30, 0.5))
            f.write(struct.pack("<Q", 0))


def test_bin_to_txt_roundtrip(tmp_path):
    d = str(tmp_path / "sparse")
    _write_bin_model(d)
    out = C.convert_bin_to_txt(d, str(tmp_path / "txt"))
    cams = C.read_cameras_txt(os.path.join(out, "cameras.txt"))
    assert cams[1].width == 64 and cams[1].intrinsics[0, 0] == 50.0
    imgs = C.read_images_txt(os.path.join(out, "images.txt"))
    assert imgs[0].name == "im0.jpg"
    np.testing.assert_allclose(imgs[0].tvec, [0.1, 0.2, 0.3])
    xyz, rgb = C.read_points3d_txt(os.path.join(out, "points3D.txt"))
    assert xyz.shape == (2, 3)
    np.testing.assert_allclose(rgb[0], np.array([10, 20, 30]) / 255.0,
                               atol=1e-6)


def test_new_loss_primitives():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    assert float(L.tv_loss(jnp.ones((8, 8)))) == 0.0
    assert float(L.tv_loss(img)) > 0.0

    gt = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    mask = jnp.zeros((16, 16)).at[:8].set(1.0)
    # pred wrong only outside the mask -> masked loss ~ 0
    pred = jnp.where(mask[..., None] > 0, gt, img)
    assert float(L.masked_image_loss(pred, gt, mask)) < 1e-6

    depth_gt = jnp.asarray(rng.rand(16, 16) + 1.0, jnp.float32)
    alpha = jnp.full((16, 16), 0.5)
    assert float(L.depth_l1_loss(depth_gt * 0.5, depth_gt, alpha)) < 1e-6
    assert float(L.disparity_pearson_loss(depth_gt, depth_gt)) < 1e-5
    # disparity pearson is scale-invariant-ish: affine depth still correlates
    assert float(L.disparity_pearson_loss(2.0 * depth_gt, depth_gt)) < 0.05
