"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dynamic3dgaussians_tpu.data import synthetic
from dynamic3dgaussians_tpu.models import gaussians as G
from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
from dynamic3dgaussians_tpu.parallel.camera_dp import collate, make_dp_train_step
from dynamic3dgaussians_tpu.parallel.mesh import make_mesh
from dynamic3dgaussians_tpu.train import optim
from dynamic3dgaussians_tpu.train.config import RasterSettings, TrainConfig
from dynamic3dgaussians_tpu.train.trainer import make_train_step, raster_config

RS = RasterSettings(chunk=64, max_per_tile=512, max_tiles_per_gaussian=64,
                    pairs_per_gaussian=16)


@pytest.fixture(scope="module")
def world():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    scene = synthetic.make_gt_scene(n_fg=40, n_bg=80, seed=0)
    dataset, w2c, cams = synthetic.make_dataset(scene, num_t=1, num_cams=8,
                                                w=48, h=32, f=40.0)
    pt = synthetic.init_point_cloud(scene, noise=0.05)
    params, variables = G.init_params(pt, w2c, capacity=256)
    return scene, dataset, params, variables


def test_dp_step_matches_single_device(world):
    scene, dataset, params, variables = world
    cfg = TrainConfig(raster=RS, capacity=256)
    rcfg = raster_config(cfg)
    mesh = make_mesh((8,), ("data",))
    dp_step = make_dp_train_step(cfg, rcfg, mesh)
    single_step = make_train_step(cfg, rcfg)

    batch = collate(dataset[0])  # 8 cameras
    opt_state = optim.init(params)
    lrs = {k: jnp.float32(0.01) for k in params}

    p_dp, o_dp, v_dp, m_dp = dp_step(params, opt_state, variables, batch,
                                     lrs, True)
    p_sg, o_sg, v_sg, m_sg = single_step(params, opt_state, variables, batch,
                                         lrs, True)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_sg["loss"]),
                               rtol=1e-5)
    for k in p_dp:
        np.testing.assert_allclose(np.asarray(p_dp[k]), np.asarray(p_sg[k]),
                                   atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(v_dp["means2D_gradient_accum"]),
                               np.asarray(v_sg["means2D_gradient_accum"]),
                               atol=1e-5)


def test_dp_step_multiple_iterations_stay_finite(world):
    scene, dataset, params, variables = world
    cfg = TrainConfig(raster=RS, capacity=256)
    mesh = make_mesh((8,), ("data",))
    dp_step = make_dp_train_step(cfg, raster_config(cfg), mesh)
    batch = collate(dataset[0])
    opt_state = optim.init(params)
    lrs = {k: jnp.float32(0.005) for k in params}
    losses = []
    for _ in range(5):
        params, opt_state, variables, m = dp_step(
            params, opt_state, variables, batch, lrs, True)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pixel_sharded_render_matches(world):
    scene, dataset, params, variables = world
    mesh = make_mesh((8,), ("tile",))
    cfg = RasterConfig(chunk=64, max_per_tile=256, max_tiles_per_gaussian=64,
                       pairs_per_gaussian=16)
    cam = dataset[0][0]["camera"]
    act = G.activated(params, variables["alive"])
    args = (cam, act["means3d"], act["colors"], act["opacity"],
            act["scales"], act["rotations"])

    plain = render(*args, config=cfg)
    shard = NamedSharding(mesh, P("tile"))
    fn = jax.jit(lambda *a: render(*a, config=cfg, tile_sharding=shard).rgb)
    sharded_rgb = fn(*args)
    np.testing.assert_allclose(np.asarray(sharded_rgb),
                               np.asarray(plain.rgb), atol=1e-5)


def test_depth_sharded_render_matches_single_device():
    import jax
    from jax.sharding import Mesh
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
    from dynamic3dgaussians_tpu.parallel.gaussian_shard import (
        make_depth_sharded_render)
    from tests.scenes import lookat_camera, random_scene

    cam, _, _ = lookat_camera(w=48, h=32, f=40.0, dist=4.0)
    means, colors, opac, scales, quats = random_scene(120, seed=7)
    args = tuple(map(jnp.asarray, (means, colors, opac, scales, quats)))
    cfg = RasterConfig(tile_h=16, tile_w=16, chunk=64,
                       max_tiles_per_gaussian=32, max_per_tile=512,
                       pairs_per_gaussian=32)
    bg = jnp.asarray([0.1, 0.2, 0.3])

    single = render(cam, *args, config=cfg, bg=bg, method="tiled")
    mesh = Mesh(np.array(jax.devices()[:4]), ("model",))
    sharded_fn = make_depth_sharded_render(cam, mesh, axis="model",
                                           config=cfg, method="tiled")
    out = sharded_fn(*args, bg=bg)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(single.rgb), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(single.alpha), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(single.depth), atol=1e-3,
                               rtol=1e-4)


def test_tile_sharded_render_matches_single_device():
    import jax
    from jax.sharding import Mesh
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
    from dynamic3dgaussians_tpu.parallel.tile_shard import (
        make_tile_sharded_render)
    from tests.scenes import lookat_camera, random_scene

    # 64x64 -> 4 tile rows, shard over 4 devices
    cam, _, _ = lookat_camera(w=64, h=64, f=50.0, dist=4.0)
    means, colors, opac, scales, quats = random_scene(100, seed=9)
    args = tuple(map(jnp.asarray, (means, colors, opac, scales, quats)))
    cfg = RasterConfig(tile_h=16, tile_w=16, chunk=64,
                       max_tiles_per_gaussian=32, max_per_tile=512,
                       pairs_per_gaussian=32)
    bg = jnp.asarray([0.05, 0.1, 0.15])
    single = render(cam, *args, config=cfg, bg=bg, method="pallas")
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    fn = make_tile_sharded_render(cam, mesh, axis="x", config=cfg)
    out = fn(*args, bg=bg)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(single.rgb), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(single.alpha), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(single.depth), atol=1e-3,
                               rtol=1e-4)


def test_dp_psum_scatter_matches_pmean(world):
    """ZeRO-style reduce-scatter + sharded Adam + all-gather must produce
    the same step as the replicated pmean baseline."""
    scene, dataset, params, variables = world
    cfg = TrainConfig(raster=RS, capacity=256)
    rcfg = raster_config(cfg)
    mesh = make_mesh((8,), ("data",))
    step_pm = make_dp_train_step(cfg, rcfg, mesh, reduce="pmean")
    step_ps = make_dp_train_step(cfg, rcfg, mesh, reduce="psum_scatter")
    batch = collate(dataset[0])
    opt_state = optim.init(params)
    lrs = {k: jnp.float32(0.01) for k in params}

    p_a, o_a, v_a, m_a = step_pm(params, opt_state, variables, batch, lrs,
                                 True)
    p_b, o_b, v_b, m_b = step_ps(params, opt_state, variables, batch, lrs,
                                 True)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    for k in p_a:
        np.testing.assert_allclose(np.asarray(p_a[k]), np.asarray(p_b[k]),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(o_a.mu[k]),
                                   np.asarray(o_b.mu[k]),
                                   atol=2e-5, rtol=1e-4)
    assert int(o_b.step) == int(o_a.step)


def test_depth_sharded_gradients_match_single_device():
    """Backward THROUGH the ordered cross-device merge (VERDICT r1 item 5):
    d(loss)/d(params) of the depth-sharded render must equal the
    single-device gradients."""
    import jax
    from jax.sharding import Mesh
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
    from dynamic3dgaussians_tpu.parallel.gaussian_shard import (
        make_depth_sharded_render)
    from tests.scenes import lookat_camera, random_scene

    cam, _, _ = lookat_camera(w=48, h=32, f=40.0, dist=4.0)
    means, colors, opac, scales, quats = random_scene(96, seed=11)
    args = tuple(map(jnp.asarray, (means, colors, opac, scales, quats)))
    cfg = RasterConfig(tile_h=16, tile_w=16, chunk=64,
                       max_tiles_per_gaussian=32, max_per_tile=512,
                       pairs_per_gaussian=32)
    mesh = Mesh(np.array(jax.devices()[:4]), ("model",))
    sharded_fn = make_depth_sharded_render(cam, mesh, axis="model",
                                           config=cfg, method="tiled")

    ct = jnp.asarray(np.random.RandomState(0).normal(
        size=(32, 48, 3)).astype(np.float32))

    def loss_single(m, c, o):
        out = render(cam, m, c, o, args[3], args[4], config=cfg,
                     method="tiled")
        return jnp.sum(out.rgb * ct) + jnp.sum(out.depth) * 0.1

    def loss_sharded(m, c, o):
        out = sharded_fn(m, c, o, args[3], args[4])
        return jnp.sum(out["rgb"] * ct) + jnp.sum(out["depth"]) * 0.1

    g_s = jax.grad(loss_single, argnums=(0, 1, 2))(*args[:3])
    g_d = jax.grad(loss_sharded, argnums=(0, 1, 2))(*args[:3])
    for a, b, name in zip(g_s, g_d, ("means", "colors", "opac")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4,
                                   rtol=1e-3, err_msg=name)


def test_tile_sharded_gradients_match_single_device():
    """Backward through the tile-stripe all_gather merge."""
    import jax
    from jax.sharding import Mesh
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
    from dynamic3dgaussians_tpu.parallel.tile_shard import (
        make_tile_sharded_render)
    from tests.scenes import lookat_camera, random_scene

    cam, _, _ = lookat_camera(w=64, h=64, f=50.0, dist=4.0)
    means, colors, opac, scales, quats = random_scene(80, seed=13)
    args = tuple(map(jnp.asarray, (means, colors, opac, scales, quats)))
    cfg = RasterConfig(tile_h=16, tile_w=16, chunk=64,
                       max_tiles_per_gaussian=32, max_per_tile=512,
                       pairs_per_gaussian=32)
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    fn = make_tile_sharded_render(cam, mesh, axis="x", config=cfg)

    ct = jnp.asarray(np.random.RandomState(1).normal(
        size=(64, 64, 3)).astype(np.float32))

    def loss_single(m, c, o):
        out = render(cam, m, c, o, args[3], args[4], config=cfg,
                     method="pallas")
        return jnp.sum(out.rgb * ct)

    def loss_sharded(m, c, o):
        out = fn(m, c, o, args[3], args[4])
        return jnp.sum(out["rgb"] * ct)

    g_s = jax.grad(loss_single, argnums=(0, 1, 2))(*args[:3])
    g_d = jax.grad(loss_sharded, argnums=(0, 1, 2))(*args[:3])
    for a, b, name in zip(g_s, g_d, ("means", "colors", "opac")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4,
                                   rtol=1e-3, err_msg=name)
