"""Reference-format on-disk round trip: files in -> train -> files out.

Pins the complete artifact flow of the reference (VERDICT r2 item 5 / next
item 8): a scene written in the exact train_beffor.py:19-136 on-disk layout
(train_meta.json + ims/ + seg/ + init_pt_cld.npz) trains through the cli
file path (not the --synthetic shortcut), emits a stacked params.npz whose
key/shape layout matches helpers.py:149-167, and that npz drives the
offline visualizer.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from dynamic3dgaussians_tpu.data import synthetic
    root = tmp_path_factory.mktemp("refdata")
    scene = synthetic.make_gt_scene(n_fg=40, n_bg=80)
    synthetic.write_reference_layout(str(root), "rt", num_t=2, num_cams=3,
                                     w=64, h=48, scene=scene)
    return str(root)


def test_layout_matches_reference_reader(scene_dir):
    from dynamic3dgaussians_tpu.data import dataset as D
    md = D.load_meta(scene_dir, "rt")
    assert set(md) >= {"fn", "hw", "k", "w2c"}
    assert len(md["fn"]) == 2 and len(md["fn"][0]) == 3
    pc = D.load_init_point_cloud(scene_dir, "rt")
    assert pc.shape == (120, 7)
    frames = D.load_timestep(scene_dir, "rt", md, 0)
    assert frames[0]["im"].shape == (48, 64, 3)
    assert frames[0]["seg"].shape == (48, 64, 3)
    # masks decode to exact {0,1} (jpg-free png path)
    segvals = np.unique(np.asarray(frames[0]["seg"][..., 0]))
    assert set(segvals.tolist()) <= {0.0, 1.0}


def test_file_train_emits_reference_npz_and_visualizes(scene_dir, tmp_path):
    from dynamic3dgaussians_tpu import cli
    out = str(tmp_path / "out")
    cfg = {"capacity": 256, "iters_first_timestep": 12,
           "iters_per_timestep": 6, "num_timesteps": 2,
           "densify_start": 4, "densify_end": 8, "densify_every": 4,
           "report_every": 4,
           "raster": {"tile_h": 8, "tile_w": 8, "chunk": 128,
                      "max_tiles_per_gaussian": 16}}
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    cli.main(["train", "--data_root", scene_dir, "--seq", "rt",
              "--exp", "e_rt", "--output", out, "--config_json", cfg_path])

    params_path = os.path.join(out, "e_rt", "rt", "params.npz")
    assert os.path.exists(params_path)
    data = np.load(params_path)
    # helpers.py:158-167 layout: keys present in every timestep stack to
    # (T, ...); t0-only keys stay unstacked.
    t_n = data["means3D"].shape
    assert data["means3D"].ndim == 3 and t_n[0] == 2 and t_n[2] == 3
    assert data["rgb_colors"].shape == (2, t_n[1], 3)
    assert data["unnorm_rotations"].shape == (2, t_n[1], 4)
    for k, last in [("seg_colors", 3), ("log_scales", 3),
                    ("logit_opacities", 1)]:
        assert data[k].ndim == 2 and data[k].shape == (t_n[1], last), k
    assert data["cam_m"].shape[-1] == 3 and data["cam_c"].shape[-1] == 3

    gif = str(tmp_path / "orbit.gif")
    cli.main(["visualize", "--params", params_path, "--out", gif,
              "--frames", "2", "--width", "64", "--height", "48"])
    assert os.path.exists(gif)


def test_evaluate_suite_multi_scene(scene_dir, tmp_path):
    """config ladder (5): the multi-scene eval driver aggregates per-scene
    PSNR/SSIM into one table (eval/suite.py; cli 'evaluate-suite')."""
    import json

    from dynamic3dgaussians_tpu import cli

    from dynamic3dgaussians_tpu.data import synthetic

    # train one tiny model on the reference-layout scene; register a second
    # sequence in the same root so the suite aggregates two real entries
    scene2 = synthetic.make_gt_scene(n_fg=40, n_bg=80, seed=4)
    synthetic.write_reference_layout(str(scene_dir), "rt2", num_t=2,
                                     num_cams=3, w=48, h=36, scene=scene2)
    out_dir = tmp_path / "out"
    cli.main(["train", "--data_root", str(scene_dir), "--seq", "rt",
              "--exp", "e", "--output", str(out_dir),
              "--timesteps", "2", "--iters_first", "8", "--iters_per_t", "4",
              "--checkpoint_every", "0"])
    params = str(out_dir / "e" / "rt" / "params.npz")
    suite_out = str(tmp_path / "suite.json")
    cli.main(["evaluate-suite", "--pairs", f"rt={params},rt2={params}",
              "--data_root", str(scene_dir), "--max_timesteps", "2",
              "--max_cams", "2", "--out", suite_out])
    with open(suite_out) as f:
        result = json.load(f)
    assert "mean" in result and "psnr" in result["mean"]
    assert len(result["scenes"]) == 2
    for sm in result["scenes"].values():
        assert np.isfinite(sm["psnr"]) and 0.0 <= sm["ssim"] <= 1.0
