"""Orbax checkpoint/resume + CLI end-to-end (train -> visualize -> evaluate)."""

import json
import os

import numpy as np
import pytest

from dynamic3dgaussians_tpu.data import synthetic
from dynamic3dgaussians_tpu.train.config import RasterSettings, TrainConfig
from dynamic3dgaussians_tpu.train.trainer import train

RS = RasterSettings(chunk=64, max_per_tile=256, max_tiles_per_gaussian=64,
                    pairs_per_gaussian=16)


def _world():
    scene = synthetic.make_gt_scene(n_fg=40, n_bg=80, seed=0)
    dataset, w2c, _ = synthetic.make_dataset(scene, num_t=2, num_cams=3,
                                             w=48, h=32, f=40.0)
    pt = synthetic.init_point_cloud(scene)
    return dataset, w2c, pt


def test_checkpoint_resume(tmp_path):
    dataset, w2c, pt = _world()
    cfg = TrainConfig(num_timesteps=2, iters_first_timestep=30,
                      iters_per_timestep=10, densify_start=10,
                      densify_every=10, raster=RS, capacity=512,
                      report_every=5)
    ckpt_dir = str(tmp_path / "ckpt")
    # full run
    out_full, params_full, _ = train(dataset, cfg, pt, w2c,
                                     checkpoint_dir=ckpt_dir,
                                     checkpoint_every=7)
    # resume from the latest mid-run checkpoint and finish
    out_res, params_res, _ = train(dataset, cfg, pt, w2c,
                                   checkpoint_dir=ckpt_dir,
                                   checkpoint_every=10**9, resume=True)
    # the resumed run restarts from the final checkpoint -> same final params
    np.testing.assert_allclose(np.asarray(params_res["means3D"]),
                               np.asarray(params_full["means3D"]),
                               atol=1e-5)


def test_cli_train_visualize_evaluate(tmp_path):
    from dynamic3dgaussians_tpu import cli

    out = str(tmp_path / "out")
    cfg = TrainConfig(num_timesteps=2, iters_first_timestep=25,
                      iters_per_timestep=5, raster=RS, capacity=512,
                      report_every=10)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())
    cli.main(["train", "--synthetic", "--seq", "syn", "--exp", "e1",
              "--output", out, "--num_cams", "3", "--config_json", cfg_path])
    params_path = os.path.join(out, "e1", "syn", "params.npz")
    assert os.path.exists(params_path)
    assert os.path.exists(os.path.join(out, "e1", "syn", "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "e1", "syn", "cfg_args.json"))

    gif = str(tmp_path / "orbit.gif")
    cli.main(["visualize", "--params", params_path, "--out", gif,
              "--frames", "2", "--width", "64", "--height", "48",
              "--focal", "40"])
    assert os.path.getsize(gif) > 100
