"""Marked-slow realistic multi-step training test (VERDICT r3 item 7).

~10k gaussians, 2 cameras, 50 optimization steps with densification every
10 on the PALLAS interpret path — exercises the densify/compaction/
capacity-growth/K-escalation interactions that the 180-gaussian e2e tests
cannot see, at minutes not hours (~1.8 s/step steady-state on the one CPU
core + one ~35 s compile per raster config).

Run:  python -m pytest -m slow tests/test_scale_slow.py -q
(the default suite excludes it via pytest.ini addopts)
"""

import numpy as np
import pytest

from dynamic3dgaussians_tpu.data import synthetic
from dynamic3dgaussians_tpu.train.config import RasterSettings, TrainConfig
from dynamic3dgaussians_tpu.train.trainer import train


@pytest.mark.slow
def test_multistep_10k_densify_pallas():
    scene = synthetic.make_gt_scene(n_fg=5000, n_bg=5000, seed=0)
    dataset, w2c, _ = synthetic.make_dataset(scene, num_t=1, num_cams=2,
                                             w=128, h=128, f=115.0)
    # subsample the init so densification has real growth pressure
    pt = synthetic.init_point_cloud(scene, noise=0.03)
    sel = np.random.RandomState(1).choice(len(pt), 8000, replace=False)
    pt = pt[np.sort(sel)]

    cfg = TrainConfig(
        num_timesteps=1, iters_first_timestep=50,
        densify_start=10, densify_every=10, densify_end=50,
        capacity=16384, grow_capacity=True, report_every=5,
        raster=RasterSettings(tile_h=16, tile_w=16, chunk=128,
                              max_tiles_per_gaussian=8, method="pallas"))

    steps, densifies, grows = [], [], []
    out, params, variables = train(
        dataset, cfg, pt, w2c,
        callbacks={
            "on_step": lambda t, i, m: steps.append(
                {"i": i, **{k: float(v) for k, v in m.items()
                            if np.ndim(v) == 0}}),
            "on_densify": lambda t, i, ds: densifies.append(
                {"i": i, "alive": int(ds.n_alive),
                 "cloned": int(ds.n_cloned), "split": int(ds.n_split),
                 "dropped": int(ds.n_dropped_capacity)}),
            "on_grow_tiles": lambda t, i, k: grows.append((i, k)),
        })

    # PSNR must climb over the run
    assert steps[-1]["psnr"] > steps[0]["psnr"] + 1.0, (
        steps[0]["psnr"], steps[-1]["psnr"])
    assert all(np.isfinite(s["loss"]) for s in steps)

    # densification actually ran and dropped nothing (growth redoes the
    # pass after any capacity overflow — trainer.densify_with_growth)
    assert densifies, "densify never fired"
    assert all(d["dropped"] == 0 for d in densifies), densifies
    assert any(d["cloned"] + d["split"] > 0 for d in densifies), densifies

    # no capacity or tile-overflow drops on any step; rect drops are
    # allowed only while the K escalation settles (trainer grows K on
    # observed truncation). The last report must be rect-clean UNLESS an
    # escalation legitimately fired at that very report (the drops it
    # responded to are recorded in that same step's metrics).
    for s in steps:
        assert s["n_dropped"] - s["n_dropped_rect"] == 0, s
    if steps[-1]["n_dropped_rect"] != 0:
        assert grows and grows[-1][0] == steps[-1]["i"], (steps[-1], grows)

    # the alive set grew from the subsampled init
    assert int(np.asarray(variables["alive"]).sum()) > 8000
