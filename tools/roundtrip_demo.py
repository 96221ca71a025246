"""End-to-end reference-format file round trip (VERDICT r2 next-item 8).

One command reproduces the reference's complete artifact flow
(train_beffor.py:279 -> helpers.py:158-167 -> visualize_org.py:46-65):

  1. write a synthetic scene to disk in the reference's exact layout
     (train_meta.json + ims/ + seg/ + init_pt_cld.npz),
  2. `cli train` on the FILES (the same reader path a real capture uses),
  3. verify the stacked params.npz key/shape layout against the
     helpers.py:158-167 contract,
  4. `cli visualize` re-loads that npz into an orbit render,
  5. write artifacts/roundtrip_demo.json summarizing every artifact.

Usage: PYTHONPATH=/root/repo python tools/roundtrip_demo.py
         [--iters 400] [--timesteps 3] [--out /tmp/rt_demo]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/rt_demo")
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--iters_later", type=int, default=120)
    ap.add_argument("--timesteps", type=int, default=3)
    ap.add_argument("--cams", type=int, default=6)
    ap.add_argument("--size", type=int, nargs=2, default=(128, 96))
    ap.add_argument("--artifact", default="artifacts/roundtrip_demo.json")
    args = ap.parse_args()

    from dynamic3dgaussians_tpu import cli
    from dynamic3dgaussians_tpu.data import synthetic

    t0 = time.time()
    w, h = args.size
    data_root = os.path.join(args.out, "data")
    base = synthetic.write_reference_layout(
        data_root, "demo", num_t=args.timesteps, num_cams=args.cams,
        w=w, h=h)
    n_files = sum(len(fs) for _, _, fs in os.walk(base))
    print(f"[1/4] wrote reference-layout scene at {base} ({n_files} files)")

    cfg = {"iters_first_timestep": args.iters,
           "iters_per_timestep": args.iters_later,
           "num_timesteps": args.timesteps,
           "report_every": 50}
    cfg_path = os.path.join(args.out, "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    out_dir = os.path.join(args.out, "output")
    cli.main(["train", "--data_root", data_root, "--seq", "demo",
              "--exp", "rt", "--output", out_dir,
              "--config_json", cfg_path])
    params_path = os.path.join(out_dir, "rt", "demo", "params.npz")
    print(f"[2/4] trained -> {params_path}")

    import numpy as np
    data = np.load(params_path)
    layout = {k: list(data[k].shape) for k in data.files}
    assert data["means3D"].ndim == 3, "stacked (T, N, 3) expected"
    print(f"[3/4] params.npz layout (helpers.py:158-167): {layout}")

    vis_path = os.path.join(args.out, "orbit.gif")
    cli.main(["visualize", "--params", params_path, "--out", vis_path,
              "--frames", "24", "--width", str(w), "--height", str(h),
              "--radius", "4.0", "--focal", "110"])
    print(f"[4/4] visualized -> {vis_path}")

    # quality probe: eval PSNR of the trained model against its own dataset
    eval_out = os.path.join(args.out, "eval.json")
    cli.main(["evaluate", "--params", params_path, "--data_root", data_root,
              "--seq", "demo", "--out", eval_out])
    with open(eval_out) as f:
        ev = json.load(f)

    summary = {
        "scene_dir": base, "n_scene_files": n_files,
        "params_npz": params_path, "params_layout": layout,
        "visualization": vis_path,
        "eval": {"mean_psnr": ev["mean_psnr"], "mean_ssim": ev["mean_ssim"]},
        "wall_s": round(time.time() - t0, 1),
        "config": cfg,
    }
    os.makedirs(os.path.dirname(args.artifact), exist_ok=True)
    with open(args.artifact, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
