"""On-device multi-step training windows (trainer.make_train_scan).

VERDICT r4 item 3: the end-to-end driver must run at ~the jitted step
speed, which requires scanning K steps per dispatch. These tests pin the
scan path's SEMANTICS to the single-step path: same camera pick stream,
same math, same trajectory (the scan body is the identical step_core, so
the trajectories agree to float tolerance), and host actions (densify /
report / checkpoint cadence) land on the same step indices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic3dgaussians_tpu.data import synthetic
from dynamic3dgaussians_tpu.models import gaussians as G
from dynamic3dgaussians_tpu.train import optim
from dynamic3dgaussians_tpu.train.config import RasterSettings, TrainConfig
from dynamic3dgaussians_tpu.train.trainer import (make_train_scan,
                                                  make_train_step,
                                                  raster_config,
                                                  stack_timestep_data, train)

RS = RasterSettings(chunk=64, max_per_tile=512, max_tiles_per_gaussian=64,
                    pairs_per_gaussian=16)


@pytest.fixture(scope="module")
def world():
    scene = synthetic.make_gt_scene(n_fg=50, n_bg=90, seed=3)
    dataset, w2c, cams = synthetic.make_dataset(scene, num_t=2, num_cams=3,
                                                w=64, h=48, f=55.0)
    pt = synthetic.init_point_cloud(scene, noise=0.05)
    return dataset, w2c, pt


def test_scan_matches_single_steps(world):
    """make_train_scan(K steps) == K sequential train_step calls."""
    dataset, w2c, pt = world
    cfg = TrainConfig(num_timesteps=1, raster=RS, capacity=512)
    rcfg = raster_config(cfg)
    step = make_train_step(cfg, rcfg)
    scan = make_train_scan(cfg, rcfg, step)

    params, variables = G.init_params(pt, w2c[None], capacity=512)
    opt_state = optim.init(params)
    lrs = {k: jnp.float32(v) for k, v in
           {**{k: 1e-3 for k in params}}.items()}
    data_stack = stack_timestep_data(dataset[0])
    sel = np.asarray([0, 2, 1, 0], np.int32)

    p1, o1, v1 = params, opt_state, variables
    for c in sel:
        batch = dataset[0][int(c)]
        p1, o1, v1, m1 = step(p1, o1, v1, batch, lrs, True)

    p2, o2, v2, m2 = scan(params, opt_state, variables, data_stack,
                          jnp.asarray(sel), lrs, True)

    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    assert np.allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # window drop metrics are SUMS (K-escalation must see any step's drops)
    assert int(m2["n_dropped_rect"]) >= 0


def test_train_with_scan_windows_matches_loop(world):
    """Full train() with steps_per_call>1 follows the same camera stream
    and lands ~the same optimum as the per-step loop."""
    dataset, w2c, pt = world

    def run(steps_per_call):
        cfg = TrainConfig(num_timesteps=2, iters_first_timestep=24,
                          iters_per_timestep=12, densify_start=8,
                          densify_every=8, densify_end=16, raster=RS,
                          capacity=512, report_every=4,
                          steps_per_call=steps_per_call, seed=7)
        logs = []
        out, params, variables = train(
            dataset, cfg, pt, w2c,
            callbacks={"on_step": lambda t, i, m: logs.append(
                (t, i, float(m["loss"])))})
        return out, logs

    out1, logs1 = run(1)
    out4, logs4 = run(4)
    # identical host-action schedule: reports fire at the same (t, i)
    assert [(t, i) for t, i, _ in logs1] == [(t, i) for t, i, _ in logs4]
    # same camera stream + same math => same trajectory to float tolerance
    for (t1, i1, l1), (t4, i4, l4) in zip(logs1, logs4):
        assert abs(l1 - l4) <= 1e-4 + 1e-3 * abs(l1), (t1, i1, l1, l4)
    np.testing.assert_allclose(out1[1]["means3D"], out4[1]["means3D"],
                               rtol=1e-4, atol=1e-5)


def test_scan_window_respects_boundaries(world):
    """Windows never swallow a densify boundary: densify runs at the same
    iteration indices regardless of steps_per_call."""
    dataset, w2c, pt = world

    def run(steps_per_call):
        cfg = TrainConfig(num_timesteps=1, iters_first_timestep=20,
                          densify_start=6, densify_every=6, densify_end=18,
                          raster=RS, capacity=512, report_every=10,
                          steps_per_call=steps_per_call, seed=1)
        hits = []
        train(dataset, cfg, pt, w2c,
              callbacks={"on_densify": lambda t, i, s: hits.append(i)})
        return hits

    assert run(1) == run(5) == [6, 12, 18]
