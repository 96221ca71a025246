"""Cached-order playback rendering (ops/playback.py).

The reference's 800-FPS headline is its visualizer loop
(visualize_org.py:46-65); playback renders cached-order frames without
emission/sort. Fresh-cache output must match the exact pallas render under
the f16 gather transport; a one-orbit-step stale cache must stay visually
identical (the staleness model in the module docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu import (RasterConfig, build_cache, make_camera,
                                    render, render_playback)
from tests.scenes import random_scene

CFG = RasterConfig(tile_h=8, tile_w=8, chunk=64, max_tiles_per_gaussian=16)


def _scene(n=300, seed=0):
    means, colors, opac, scales, quats = random_scene(n, seed=seed)
    return tuple(map(jnp.asarray, (means, colors, opac, scales, quats)))


def _cam(dx=0.0, w=64, h=48):
    w2c = np.eye(4)
    w2c[2, 3] = 4.0
    w2c[0, 3] = dx
    return make_camera(w, h, [[60, 0, w / 2], [0, 60, h / 2], [0, 0, 1]],
                       w2c)


def test_playback_fresh_cache_matches_exact():
    a = _scene()
    cam = _cam()
    bg = jnp.asarray([0.2, 0.1, 0.3])
    exact = render(cam, *a, method="pallas", config=CFG, bg=bg)
    cache = build_cache(cam, a[0], a[2], a[3], a[4], config=CFG)
    pb = render_playback(cam, *a, cache, config=CFG, bg=bg)
    np.testing.assert_allclose(np.asarray(pb.rgb), np.asarray(exact.rgb),
                               atol=3.9e-3)  # f16 transport, 8-bit quantum
    np.testing.assert_allclose(np.asarray(pb.alpha),
                               np.asarray(exact.alpha), atol=3.9e-3)
    np.testing.assert_allclose(np.asarray(pb.depth),
                               np.asarray(exact.depth), atol=2e-2,
                               rtol=1e-3)


def test_playback_stale_cache_visually_close():
    a = _scene(seed=3)
    cam0, cam1 = _cam(0.0), _cam(0.01)  # ~one orbit step of motion
    cache = build_cache(cam0, a[0], a[2], a[3], a[4], config=CFG)
    exact = render(cam1, *a, method="pallas", config=CFG)
    pb = render_playback(cam1, *a, cache, config=CFG)
    mse = float(jnp.mean((pb.rgb - exact.rgb) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 45.0, psnr  # far above visual threshold (~40 dB)


def test_playback_jits_and_extra_channels():
    a = _scene(n=120, seed=5)
    cam = _cam()
    seg = jnp.asarray(np.random.RandomState(0).rand(120, 3), jnp.float32)
    cache = jax.jit(
        lambda m, o, s, q: build_cache(cam, m, o, s, q, config=CFG)
    )(a[0], a[2], a[3], a[4])
    f = jax.jit(lambda m, c, o, s, q, cch: render_playback(
        cam, m, c, o, s, q, cch, config=CFG, extra_channels=seg).rgb)
    img = f(*a, cache)
    assert np.isfinite(np.asarray(img)).all()
    exact = render(cam, *a, method="pallas", config=CFG,
                   extra_channels=seg)
    pb = render_playback(cam, *a, cache, config=CFG, extra_channels=seg)
    np.testing.assert_allclose(np.asarray(pb.extra),
                               np.asarray(exact.extra), atol=3.9e-3)


def test_orbit_render_resort_every():
    """orbit_render's playback mode (resort_every>1) must stay visually
    indistinguishable from the exact per-frame path on a smooth orbit."""
    from dynamic3dgaussians_tpu.viz.render import orbit_render
    rng = np.random.RandomState(0)
    n = 150
    stacked = {
        "means3D": rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        "rgb_colors": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "unnorm_rotations": rng.normal(size=(n, 4)).astype(np.float32),
        "logit_opacities": rng.uniform(0, 2, (n, 1)).astype(np.float32),
        "log_scales": np.log(rng.uniform(0.03, 0.1, (n, 3))
                             ).astype(np.float32),
    }
    # staleness error scales with image motion per key-frame interval: a
    # 48-frame full orbit at resort_every=2 (7.5 deg/frame — far coarser
    # than any high-fps interactive loop) must stay at/above the visual
    # threshold. Calibrated: min 39.9 dB, mean 59.6 dB on this scene.
    kw = dict(n_frames=48, w=64, h=48, f=55.0, radius=3.0, config=CFG)
    exact = orbit_render(stacked, method="pallas", **kw)
    fast = orbit_render(stacked, method="pallas", resort_every=2, **kw)
    ps = []
    for a, b in zip(exact, fast):
        mse = float(np.mean((a.astype(np.float64) - b) ** 2))
        ps.append(10 * np.log10(255.0 ** 2 / max(mse, 1e-12)))
    assert min(ps) > 35.0 and float(np.mean(ps)) > 50.0, (min(ps),
                                                          np.mean(ps))


def test_live_viewer_playback_source():
    """CheckpointSource with use_playback=True must serve frames matching
    the exact path and refresh its cache on camera jumps."""
    from dynamic3dgaussians_tpu.viz.live_viewer import (CheckpointSource,
                                                        orbit_camera)
    rng = np.random.RandomState(1)
    n = 120
    stacked = {
        "means3D": rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        "rgb_colors": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "unnorm_rotations": rng.normal(size=(n, 4)).astype(np.float32),
        "logit_opacities": rng.uniform(0, 2, (n, 1)).astype(np.float32),
        "log_scales": np.log(rng.uniform(0.03, 0.1, (n, 3))
                             ).astype(np.float32),
    }
    exact_src = CheckpointSource(stacked, config=CFG, use_playback=False)
    pb_src = CheckpointSource(stacked, config=CFG, use_playback=True,
                              resort_every=4)
    center = stacked["means3D"].mean(0)
    for i, az in enumerate([0.0, 0.02, 0.04, 3.0]):  # last = camera jump
        cam = orbit_camera(center, az, 0.3, 3.0, 64, 48, 55.0)
        a = exact_src.frame(cam, 0, "color", False)
        b = pb_src.frame(cam, 0, "color", False)
        mse = float(np.mean((a.astype(np.float64) - b) ** 2))
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
        assert psnr > 38.0, (i, psnr)
    # the 3.0-rad jump must have forced a cache rebuild (age reset to 1)
    assert pb_src._pb[0]["age"] == 1
