"""Multi-scene evaluation suite (BASELINE config ladder step 5).

The reference defers its evaluation code to a future release
(/root/reference/README.md:74-78); this module provides the per-scene and
suite-level drivers its paper tables imply: masked PSNR/SSIM (+ depth
abs-rel through point-cloud reprojection when GT depth exists) per
(timestep, camera) view, aggregated per sequence and across a suite.

Used by `cli.py evaluate` (one sequence) and `cli.py evaluate-suite`
(many sequences -> one table + JSON artifact).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def evaluate_sequence(stacked: Dict, data_root: str, seq: str,
                      max_timesteps: int = 10, max_cams: int = 4
                      ) -> Tuple[Dict, List[Dict]]:
    """Render-vs-GT metrics for one trained sequence.

    Returns (summary, rows): summary has mean psnr/ssim (+ depth_abs_rel
    when GT depth exists); rows carry the per-(t, cam) values.
    """
    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.data import dataset as D
    from dynamic3dgaussians_tpu.eval import metrics as M
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig
    from dynamic3dgaussians_tpu.viz.render import params_at_t, render_frame

    md = D.load_meta(data_root, seq)
    num_t = stacked["means3D"].shape[0] if stacked["means3D"].ndim == 3 else 1
    rows: List[Dict] = []
    # Metric runs want bit-faithful depth: the training fast path quantizes
    # depth into the fused sort key (ops/sorted_raster.py); "exact" carries
    # the f32 depth row instead.
    eval_rcfg = RasterConfig(depth_mode="exact")
    for t in range(min(num_t, max_timesteps)):
        frames = D.load_timestep(data_root, seq, md, t)
        for f in frames[:max_cams]:
            out = render_frame(params_at_t(stacked, t), f["camera"],
                               config=eval_rcfg)
            row = {
                "t": t, "cam": int(f["cam_id"]),
                "psnr": float(M.masked_psnr(jnp.clip(out.rgb, 0, 1),
                                            f["im"])),
                "ssim": float(M.masked_ssim(jnp.clip(out.rgb, 0, 1),
                                            f["im"])),
            }
            if "gt_depth" in f:
                cam = f["camera"]
                k = np.array([[float(cam.fx), 0, float(cam.cx)],
                              [0, float(cam.fy), float(cam.cy)],
                              [0, 0, 1]], np.float32)
                d = out.depth / jnp.maximum(out.alpha, 1e-6)
                row["depth_abs_rel"] = float(M.depth_abs_rel_reprojected(
                    d, f["gt_depth"], jnp.asarray(k)))
            rows.append(row)
    summary: Dict = {
        "psnr": float(np.mean([r["psnr"] for r in rows])),
        "ssim": float(np.mean([r["ssim"] for r in rows])),
        "n_views": len(rows),
    }
    d_rows = [r["depth_abs_rel"] for r in rows if "depth_abs_rel" in r]
    if d_rows:
        summary["depth_abs_rel"] = float(np.mean(d_rows))
    return summary, rows


def evaluate_suite(pairs: List[Tuple[str, str]], data_root: str,
                   max_timesteps: int = 10, max_cams: int = 4,
                   out_path: Optional[str] = None) -> Dict:
    """Evaluate many (seq, params_path) pairs and aggregate.

    Returns {"scenes": {seq: summary}, "mean": {...}} — the multi-scene
    PSNR/SSIM table of the reference's paper, emitted as JSON.
    """
    import json

    from dynamic3dgaussians_tpu.viz.export import load_params

    scenes: Dict[str, Dict] = {}
    all_rows: Dict[str, List[Dict]] = {}
    for seq, params_path in pairs:
        stacked = load_params(params_path)
        summary, rows = evaluate_sequence(stacked, data_root, seq,
                                          max_timesteps, max_cams)
        # same seq evaluated with several checkpoints (A/B use) must not
        # silently overwrite: disambiguate the result key
        key_name, dup = seq, 2
        while key_name in scenes:
            key_name = f"{seq}#{dup}"
            dup += 1
        if key_name != seq:
            summary = dict(summary, params_path=params_path)
        scenes[key_name] = summary
        all_rows[key_name] = rows
    mean = {}
    for key in ("psnr", "ssim", "depth_abs_rel"):
        vals = [s[key] for s in scenes.values() if key in s]
        if vals:
            mean[key] = float(np.mean(vals))
    result = {"scenes": scenes, "mean": mean}
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"scenes": scenes, "mean": mean,
                       "rows": all_rows}, f, indent=2)
    return result
