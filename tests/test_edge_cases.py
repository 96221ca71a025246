"""Renderer edge cases: empty scenes, single gaussian, tiny images, culling."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
from tests.scenes import lookat_camera

CFG = RasterConfig(tile_h=16, tile_w=16, chunk=64, max_per_tile=256,
                   max_tiles_per_gaussian=16, pairs_per_gaussian=16)


def _one(method, n=1, **kw):
    cam, _, _ = lookat_camera(w=32, h=16, f=30.0, dist=4.0)
    means = jnp.zeros((n, 3))
    colors = jnp.ones((n, 3)) * 0.7
    opac = jnp.full((n,), 0.9)
    scales = jnp.full((n, 3), 0.1)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    return render(cam, means, colors, opac, scales, quats, config=CFG,
                  method=method, **kw)


def test_single_gaussian_all_paths_agree():
    outs = {m: _one(m) for m in ("reference", "tiled", "pallas")}
    for m in ("tiled", "pallas"):
        np.testing.assert_allclose(np.asarray(outs[m].rgb),
                                   np.asarray(outs["reference"].rgb),
                                   atol=2e-5)
    assert float(outs["pallas"].alpha.max()) > 0.5


def test_all_culled_scene():
    """Every gaussian behind the camera: black image, zero grads, no NaNs."""
    cam, _, _ = lookat_camera(w=32, h=16, f=30.0, dist=4.0)
    n = 20
    means = jnp.zeros((n, 3)).at[:, 2].set(-10.0)  # behind (depth < 0)
    colors = jnp.ones((n, 3))
    opac = jnp.full((n,), 0.9)
    scales = jnp.full((n, 3), 0.05)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    for method in ("tiled", "pallas"):
        out = render(cam, means, colors, opac, scales, quats, config=CFG,
                     method=method)
        assert float(jnp.abs(out.rgb).max()) == 0.0
        assert float(out.alpha.max()) == 0.0
        g = jax.grad(lambda m: render(cam, m, colors, opac, scales, quats,
                                      config=CFG, method=method).rgb.sum())(
            means)
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) == 0.0


def test_single_tile_image():
    """Image no larger than one tile (grid 1x1)."""
    cam, _, _ = lookat_camera(w=16, h=16, f=20.0, dist=4.0)
    n = 30
    rng = np.random.RandomState(0)
    means = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    colors = jnp.asarray(rng.rand(n, 3), jnp.float32)
    opac = jnp.full((n,), 0.8)
    scales = jnp.full((n, 3), 0.08)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    a = render(cam, means, colors, opac, scales, quats, config=CFG,
               method="tiled")
    b = render(cam, means, colors, opac, scales, quats, config=CFG,
               method="pallas")
    np.testing.assert_allclose(np.asarray(b.rgb), np.asarray(a.rgb),
                               atol=2e-4)


def test_non_multiple_of_tile_image():
    """Image dims not divisible by the tile size (padding/untile path)."""
    cam, _, _ = lookat_camera(w=37, h=23, f=25.0, dist=4.0)
    n = 40
    rng = np.random.RandomState(1)
    means = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    colors = jnp.asarray(rng.rand(n, 3), jnp.float32)
    opac = jnp.full((n,), 0.8)
    scales = jnp.full((n, 3), 0.1)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    a = render(cam, means, colors, opac, scales, quats, config=CFG,
               method="reference")
    b = render(cam, means, colors, opac, scales, quats, config=CFG,
               method="pallas")
    assert b.rgb.shape == (23, 37, 3)
    np.testing.assert_allclose(np.asarray(b.rgb), np.asarray(a.rgb),
                               atol=3e-4)


def test_fewer_gaussians_than_chunk():
    """N < chunk: padding slack must not contribute."""
    out = _one("pallas", n=2)
    ref = _one("reference", n=2)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                               atol=2e-5)
