"""Renderer correctness: oracle vs golden NumPy vs tiled XLA, plus gradients.

This is the parity layer BASELINE.json demands ("allclose on rendered
RGB/depth images and parameter gradients"): golden_numpy.py re-implements the
CUDA forward semantics independently; both JAX paths must match it, and the
tiled path must match the oracle bit-for-bit-to-tolerance including grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
from tests.golden_numpy import golden_render
from tests.scenes import lookat_camera, random_scene

CFG = RasterConfig(tile_h=16, tile_w=16, chunk=64, max_per_tile=256,
                   max_tiles_per_gaussian=64, pairs_per_gaussian=32)


def _render_both(n=120, seed=0, w=48, h=32, bg=None):
    cam, k, w2c = lookat_camera(w=w, h=h, f=50.0, dist=4.0)
    means, colors, opac, scales, quats = random_scene(n, seed=seed)
    args = (cam, jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opac),
            jnp.asarray(scales), jnp.asarray(quats))
    kw = dict(bg=bg, config=CFG)
    ref = render(*args, method="reference", **kw)
    til = render(*args, method="tiled", **kw)
    golden = golden_render(
        w2c, np.asarray(cam.proj, np.float64), 50.0, 50.0, w / 2, h / 2, w, h,
        means.astype(np.float64), colors.astype(np.float64),
        opac.astype(np.float64), scales.astype(np.float64),
        quats.astype(np.float64), bg=bg)
    return ref, til, golden


def test_oracle_matches_golden_numpy():
    ref, _, golden = _render_both()
    np.testing.assert_allclose(np.asarray(ref.rgb), golden["channels"],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(ref.depth), golden["depth"],
                               atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ref.alpha), golden["alpha"],
                               atol=2e-3)
    np.testing.assert_array_equal(np.asarray(ref.radii), golden["radii"])


def test_tiled_matches_oracle():
    ref, til, _ = _render_both(n=200, seed=3)
    assert int(til.n_dropped_capacity) == 0
    assert int(til.n_dropped_rect) == 0
    assert int(til.n_dropped_tile_overflow) == 0
    np.testing.assert_allclose(np.asarray(til.rgb), np.asarray(ref.rgb),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(til.depth), np.asarray(ref.depth),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(til.alpha), np.asarray(ref.alpha),
                               atol=1e-4)


def test_background_composited():
    bg = np.array([0.1, 0.7, 0.3], np.float32)
    ref, til, golden = _render_both(n=30, seed=5, bg=bg)
    np.testing.assert_allclose(np.asarray(til.rgb), golden["channels"],
                               atol=2e-3)
    # a pixel with nothing in front should be exactly bg
    alpha = np.asarray(til.alpha)
    empty = np.unravel_index(np.argmin(alpha), alpha.shape)
    if alpha[empty] < 1e-6:
        np.testing.assert_allclose(np.asarray(til.rgb)[empty], bg, atol=1e-5)


def test_extra_channels_match_second_render():
    """One pass with extra channels == the reference's second seg render."""
    cam, _, _ = lookat_camera()
    means, colors, opac, scales, quats = random_scene(80, seed=9)
    seg = np.random.RandomState(1).uniform(0, 1, (80, 3)).astype(np.float32)
    joint = render(cam, jnp.asarray(means), jnp.asarray(colors),
                   jnp.asarray(opac), jnp.asarray(scales), jnp.asarray(quats),
                   extra_channels=jnp.asarray(seg), config=CFG)
    seg_as_rgb = render(cam, jnp.asarray(means), jnp.asarray(seg),
                        jnp.asarray(opac), jnp.asarray(scales),
                        jnp.asarray(quats), config=CFG)
    np.testing.assert_allclose(np.asarray(joint.extra),
                               np.asarray(seg_as_rgb.rgb), atol=1e-5)


def test_grads_tiled_vs_oracle():
    cam, _, _ = lookat_camera(w=32, h=32)
    means, colors, opac, scales, quats = random_scene(64, seed=11)
    target = jnp.zeros((32, 32, 3))

    def loss(method):
        def f(m, c, o, s, q):
            out = render(cam, m, c, o, s, q, method=method, config=CFG)
            return jnp.mean((out.rgb - target) ** 2) + 0.1 * jnp.mean(out.depth)
        return f

    args = tuple(map(jnp.asarray, (means, colors, opac, scales, quats)))
    g_ref = jax.grad(loss("reference"), argnums=(0, 1, 2, 3, 4))(*args)
    g_til = jax.grad(loss("tiled"), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_ref, g_til):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-3)
        assert np.isfinite(np.asarray(a)).all()
        assert np.abs(np.asarray(a)).max() > 0  # gradients actually flow


def test_grads_finite_difference():
    """Spot-check analytic grads vs central differences (means only)."""
    cam, _, _ = lookat_camera(w=24, h=24)
    means, colors, opac, scales, quats = random_scene(12, seed=13,
                                                      scale_lo=0.05,
                                                      scale_hi=0.2)
    args = tuple(map(jnp.asarray, (means, colors, opac, scales, quats)))

    def f(m):
        out = render(cam, m, *args[1:], method="reference", config=CFG)
        return jnp.mean(out.rgb ** 2)

    g = np.asarray(jax.grad(f)(args[0]))
    eps = 1e-3
    rng = np.random.RandomState(0)
    for _ in range(5):
        i, j = rng.randint(12), rng.randint(3)
        m_p, m_m = means.copy(), means.copy()
        m_p[i, j] += eps
        m_m[i, j] -= eps
        fd = (float(f(jnp.asarray(m_p))) - float(f(jnp.asarray(m_m)))) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, atol=2e-3, rtol=5e-2)


def test_mean2d_probe_grads():
    """The densification probe receives NDC-space gradients."""
    cam, _, _ = lookat_camera(w=32, h=32)
    means, colors, opac, scales, quats = random_scene(64, seed=17)
    args = tuple(map(jnp.asarray, (means, colors, opac, scales, quats)))
    probe = jnp.zeros((64, 2))

    def f(p):
        out = render(cam, *args, mean2d_probe_ndc=p, config=CFG)
        return jnp.mean((out.rgb - 0.5) ** 2)

    g = np.asarray(jax.grad(f)(probe))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_grad_mask_freezes_gaussians():
    cam, _, _ = lookat_camera(w=32, h=32)
    means, colors, opac, scales, quats = random_scene(64, seed=19)
    args = tuple(map(jnp.asarray, (means, colors, opac, scales, quats)))
    mask = jnp.asarray(np.arange(64) < 32, jnp.float32)

    def f(m, c):
        out = render(cam, m, c, *args[2:], grad_mask=mask, config=CFG)
        return jnp.mean(out.rgb ** 2)

    gm, gc = jax.grad(f, argnums=(0, 1))(args[0], args[1])
    assert np.abs(np.asarray(gm)[32:]).max() == 0
    assert np.abs(np.asarray(gc)[32:]).max() == 0
    assert np.abs(np.asarray(gm)[:32]).max() > 0


def test_overflow_counters_trip():
    """Undersized capacities are *reported*, not silent."""
    cam, _, _ = lookat_camera(w=48, h=48)
    means, colors, opac, scales, quats = random_scene(300, seed=23,
                                                      scale_hi=0.4)
    tiny = RasterConfig(tile_h=16, tile_w=16, chunk=32, max_per_tile=32,
                        max_tiles_per_gaussian=4, pairs_per_gaussian=1)
    out = render(cam, jnp.asarray(means), jnp.asarray(colors),
                 jnp.asarray(opac), jnp.asarray(scales), jnp.asarray(quats),
                 config=tiny)
    total = (int(out.n_dropped_capacity) + int(out.n_dropped_rect)
             + int(out.n_dropped_tile_overflow))
    assert total > 0
