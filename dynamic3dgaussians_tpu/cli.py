"""Command-line entry points: train / visualize / evaluate.

The reference ships each trainer as a standalone script with
`train(seq, exp)` + argparse (SURVEY.md §2.3); here one CLI covers the
canonical flows and writes outputs in the reference's
./output/{exp}/{seq}/params.npz layout so its downstream tooling works.

  python -m dynamic3dgaussians_tpu.cli train --data_root data --seq cmu_bike \
      --exp exp1 [--synthetic] [--resume]
  python -m dynamic3dgaussians_tpu.cli visualize --params output/exp1/seq/params.npz
  python -m dynamic3dgaussians_tpu.cli evaluate --params ... --data_root ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _add_train_cfg_args(p: argparse.ArgumentParser):
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--iters_first", type=int, default=None)
    p.add_argument("--iters_per_t", type=int, default=None)
    p.add_argument("--capacity", type=int, default=None)
    p.add_argument("--config_json", type=str, default=None,
                   help="TrainConfig overrides as a JSON file")


def load_run_config(model_dir):
    """TrainConfig saved next to a previous run's outputs (the reference's
    get_combined_args cfg_args merging, arguments/__init__.py:97-117)."""
    from dynamic3dgaussians_tpu.train.config import TrainConfig
    with open(os.path.join(model_dir, "cfg_args.json")) as f:
        return TrainConfig.from_json(f.read())


def _build_cfg(args):
    from dynamic3dgaussians_tpu.train.config import TrainConfig
    cfg = TrainConfig()
    if getattr(args, "model_dir", None):
        cfg = load_run_config(args.model_dir)
    if args.config_json:
        # Overlay: only keys present in the JSON override the base config
        # (the reference's get_combined_args merges cfg_args with CLI the
        # same way, arguments/__init__.py:97-117).
        import dataclasses as _dc
        import json as _json
        with open(args.config_json) as f:
            over = _json.load(f)
        for k, v in over.items():
            if not hasattr(cfg, k):
                raise SystemExit(f"unknown config field {k!r} in "
                                 f"{args.config_json}")
            if k == "raster":
                fields = {f.name for f in _dc.fields(cfg.raster)}
                for rk in v:
                    if rk not in fields:
                        raise SystemExit(f"unknown config field "
                                         f"'raster.{rk}' in "
                                         f"{args.config_json}")
                cfg.raster = _dc.replace(cfg.raster, **v)
            elif k in ("lrs", "loss_weights"):
                # per-key override — a partial dict must not wipe defaults
                # (lr_tree/loss weighting .get(k, 0.0) would silently freeze
                # every unmentioned group)
                merged = dict(getattr(cfg, k))
                merged.update(v)
                setattr(cfg, k, merged)
            elif k == "freeze_after_t0":
                cfg.freeze_after_t0 = tuple(v)
            else:
                setattr(cfg, k, v)
    if args.timesteps is not None:
        cfg.num_timesteps = args.timesteps
    if args.iters_first is not None:
        cfg.iters_first_timestep = args.iters_first
    if args.iters_per_t is not None:
        cfg.iters_per_timestep = args.iters_per_t
    if args.capacity is not None:
        cfg.capacity = args.capacity
    return cfg


def cmd_train(args):
    from dynamic3dgaussians_tpu.train.trainer import train
    from dynamic3dgaussians_tpu.utils.logging import RunLogger, safe_state
    from dynamic3dgaussians_tpu.viz.export import save_params

    cfg = _build_cfg(args)
    safe_state(cfg.seed)
    out_dir = os.path.join(args.output, args.exp, args.seq)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "cfg_args.json"), "w") as f:
        f.write(cfg.to_json())

    if args.synthetic:
        from dynamic3dgaussians_tpu.data import synthetic
        scene = synthetic.make_gt_scene()
        dataset, w2c, _ = synthetic.make_dataset(scene, cfg.num_timesteps,
                                                 num_cams=args.num_cams)
        pt_cld = synthetic.init_point_cloud(scene)
    else:
        from dynamic3dgaussians_tpu import native
        from dynamic3dgaussians_tpu.data import dataset as D
        md = D.load_meta(args.data_root, args.seq)
        cfg.num_timesteps = min(cfg.num_timesteps, len(md["fn"]))
        loader = native.FileLoader() if native.available() else None

        def dataset(t, _md=md):  # lazy per-timestep stream + IO prefetch
            return D.load_timestep(args.data_root, args.seq, _md, t,
                                   load_depth=args.load_depth, loader=loader,
                                   prefetch_next=True)

        pt_cld = D.load_init_point_cloud(args.data_root, args.seq)
        w2c = D.scene_w2c_stack(md)

    logger = RunLogger(out_dir, use_wandb=args.wandb)

    def on_step(t, i, metrics):
        logger.log(i, {k: float(v) for k, v in metrics.items()},
                   prefix=f"t{t}/")
        if i % (cfg.report_every * 5) == 0:
            print(f"t={t} i={i} loss={float(metrics['loss']):.4f} "
                  f"psnr={float(metrics['psnr']):.2f}", flush=True)

    get_frames = dataset if callable(dataset) else dataset.__getitem__

    def on_timestep(t, params, variables):
        # render-vs-GT panel per finished timestep (the reference's wandb
        # image dumps, ssd_train.py:484-672) — written as PNGs + wandb
        import numpy as _np

        from dynamic3dgaussians_tpu.models.gaussians import activated
        from dynamic3dgaussians_tpu.ops.rasterize import render as _render
        from dynamic3dgaussians_tpu.viz.render import to_uint8
        frame = get_frames(t)[0]
        act = activated(params, variables["alive"])
        out = _render(frame["camera"], act["means3d"], act["colors"],
                      act["opacity"], act["scales"], act["rotations"])
        panel = _np.concatenate([to_uint8(out.rgb),
                                 to_uint8(frame["im"])], axis=1)
        logger.log_image(t, f"panel_t{t}", panel)

    output_params, params, variables = train(
        dataset, cfg, pt_cld, w2c,
        callbacks={"on_step": on_step, "on_timestep": on_timestep},
        checkpoint_dir=os.path.join(out_dir, "ckpt")
        if args.checkpoint_every else None,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume)
    path = save_params(output_params, out_dir)
    print(f"saved {path}")
    logger.close()


def cmd_visualize(args):
    from dynamic3dgaussians_tpu.viz.export import load_params
    from dynamic3dgaussians_tpu.viz.render import orbit_render, save_gif

    stacked = load_params(args.params)
    import jax
    frames = orbit_render(
        stacked, n_frames=args.frames, w=args.width, h=args.height,
        f=args.focal, radius=args.radius,
        method="pallas" if jax.default_backend() == "tpu" else "tiled",
        resort_every=args.resort_every)
    out = args.out or (os.path.splitext(args.params)[0] + "_orbit.gif")
    save_gif(frames, out, fps=args.fps)
    print(f"saved {out}")


def cmd_view(args):
    from dynamic3dgaussians_tpu.viz import live_viewer

    if args.gui_host:
        live_viewer.serve_live(args.gui_host, args.gui_port, args.host,
                               args.port, w=args.width, h=args.height,
                               f=args.focal)
    else:
        if not args.params:
            raise SystemExit("view: need --params or --gui_host")
        from dynamic3dgaussians_tpu.viz.export import load_params
        live_viewer.serve(load_params(args.params), args.host, args.port,
                          w=args.width, h=args.height, f=args.focal)


def cmd_evaluate(args):
    from dynamic3dgaussians_tpu.eval.suite import evaluate_sequence
    from dynamic3dgaussians_tpu.viz.export import load_params

    stacked = load_params(args.params)
    summary, rows = evaluate_sequence(stacked, args.data_root, args.seq,
                                      max_timesteps=args.max_timesteps,
                                      max_cams=args.max_cams)
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"mean_psnr": summary["psnr"],
                       "mean_ssim": summary["ssim"], "rows": rows}, f,
                      indent=2)


def cmd_evaluate_suite(args):
    from dynamic3dgaussians_tpu.eval.suite import evaluate_suite

    pairs = []
    for item in args.pairs.split(","):
        seq, _, path = item.partition("=")
        if not path:
            raise SystemExit(f"--pairs item '{item}' must be seq=params.npz")
        pairs.append((seq, path))
    result = evaluate_suite(pairs, args.data_root,
                            max_timesteps=args.max_timesteps,
                            max_cams=args.max_cams, out_path=args.out)
    for seq, sm in result["scenes"].items():
        print(f"{seq}: psnr {sm['psnr']:.2f} ssim {sm['ssim']:.4f}"
              + (f" absrel {sm['depth_abs_rel']:.4f}"
                 if "depth_abs_rel" in sm else ""))
    print(json.dumps({"mean": result["mean"],
                      "n_scenes": len(result["scenes"])}))


def main(argv=None):
    from dynamic3dgaussians_tpu.utils.compile_cache import enable as \
        enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser(prog="dynamic3dgaussians_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="dynamic per-timestep optimization")
    p.add_argument("--model_dir", type=str, default=None,
                   help="load the TrainConfig of a previous run "
                        "(cfg_args.json) as the base")
    p.add_argument("--data_root", type=str, default="./data_ego")
    p.add_argument("--seq", type=str, default="synthetic")
    p.add_argument("--exp", type=str, default="exp")
    p.add_argument("--output", type=str, default="./output")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the built-in synthetic scene")
    p.add_argument("--num_cams", type=int, default=6)
    p.add_argument("--load_depth", action="store_true")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--checkpoint_every", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    _add_train_cfg_args(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("visualize", help="orbit-render a params.npz to GIF")
    p.add_argument("--params", type=str, required=True)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--focal", type=float, default=500.0)
    p.add_argument("--radius", type=float, default=4.0)
    p.add_argument("--fps", type=int, default=20)
    p.add_argument("--resort-every", type=int, default=1,
                   help="cached-order playback interval (>1 = fast "
                        "visualizer-loop path, ops/playback.py)")
    p.set_defaults(fn=cmd_visualize)

    p = sub.add_parser("view", help="interactive browser viewer "
                       "(orbit/zoom/playback; visualize_org.py equivalent)")
    p.add_argument("--params", type=str, default=None,
                   help="stacked params.npz to serve")
    p.add_argument("--gui_host", type=str, default=None,
                   help="bridge to a live training network-GUI instead")
    p.add_argument("--gui_port", type=int, default=6009)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--focal", type=float, default=500.0)
    p.set_defaults(fn=cmd_view)

    p = sub.add_parser("evaluate", help="PSNR/SSIM vs dataset images")
    p.add_argument("--params", type=str, required=True)
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--seq", type=str, required=True)
    p.add_argument("--max_timesteps", type=int, default=10)
    p.add_argument("--max_cams", type=int, default=4)
    p.add_argument("--out", type=str, default=None)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("evaluate-suite",
                       help="multi-scene eval table (config ladder 5)")
    p.add_argument("--pairs", type=str, required=True,
                   help="comma list of seq=params.npz")
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--max_timesteps", type=int, default=10)
    p.add_argument("--max_cams", type=int, default=4)
    p.add_argument("--out", type=str, default=None)
    p.set_defaults(fn=cmd_evaluate_suite)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
