"""Synthetic dynamic gaussian scenes: ground truth for tests and benchmarks.

The reference trains on CMU panoptic / ego captures we don't ship; this
module builds a self-consistent substitute: a ground-truth gaussian scene
(static background shell + rigidly moving foreground cluster), rendered with
the framework's own oracle-grade renderer into images/seg/depth per timestep.
Recovering the scene from those renders exercises the full training loop.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.ops.camera import Camera, orbit_cameras
from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render


def make_gt_scene(n_fg: int = 120, n_bg: int = 300, seed: int = 0):
    """Ground-truth gaussian soup: fg cluster near origin, bg shell around."""
    rng = np.random.RandomState(seed)
    fg = rng.normal(0, 0.35, (n_fg, 3))
    theta = rng.uniform(0, 2 * np.pi, n_bg)
    phi = np.arccos(rng.uniform(-1, 1, n_bg))
    r = rng.uniform(1.8, 2.2, n_bg)
    bg = np.stack([r * np.sin(phi) * np.cos(theta),
                   r * np.sin(phi) * np.sin(theta) * 0.5,
                   r * np.cos(phi)], axis=-1)
    means = np.concatenate([fg, bg]).astype(np.float32)
    n = n_fg + n_bg
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.6, 0.95, (n,)).astype(np.float32)
    scales = np.concatenate([
        rng.uniform(0.04, 0.10, (n_fg, 3)),
        rng.uniform(0.08, 0.20, (n_bg, 3))]).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    seg = np.concatenate([np.ones(n_fg), np.zeros(n_bg)]).astype(np.float32)
    return dict(means=means, colors=colors, opac=opac, scales=scales,
                quats=quats, seg=seg, n_fg=n_fg)


def animate(scene: Dict, t: int, num_t: int) -> np.ndarray:
    """Rigid fg motion: translate + rotate the cluster about y over time."""
    means = scene["means"].copy()
    n_fg = scene["n_fg"]
    frac = t / max(num_t - 1, 1)
    ang = 0.6 * frac
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    shift = np.array([0.35 * frac, -0.15 * frac, 0.0], np.float32)
    means[:n_fg] = scene["means"][:n_fg] @ R.T + shift
    return means


def make_dataset(scene: Dict, num_t: int, num_cams: int = 6,
                 w: int = 128, h: int = 96, f: float = 110.0,
                 raster_cfg: RasterConfig | None = None
                 ) -> Tuple[List[List[Dict]], np.ndarray, List[Camera]]:
    """Render the GT scene per timestep into a trainer-ready dataset.

    Returns (dataset[t][c] dicts, w2c_stack (C,4,4), cameras).
    """
    cfg = raster_cfg or RasterConfig(max_per_tile=512, pairs_per_gaussian=16,
                                     max_tiles_per_gaussian=64)
    cams = orbit_cameras(center=(0.0, 0.0, 0.0), radius=4.0, height=-1.0,
                         n=num_cams, w=w, h=h, f=f)
    w2c_stack = np.stack([np.asarray(c.w2c) for c in cams])
    seg = scene["seg"]
    seg_colors = np.stack([seg, np.zeros_like(seg), 1 - seg], -1)
    dataset: List[List[Dict]] = []
    for t in range(num_t):
        means = animate(scene, t, num_t)
        frames = []
        for ci, cam in enumerate(cams):
            out = render(cam, jnp.asarray(means), jnp.asarray(scene["colors"]),
                         jnp.asarray(scene["opac"]), jnp.asarray(scene["scales"]),
                         jnp.asarray(scene["quats"]),
                         extra_channels=jnp.asarray(seg_colors), config=cfg)
            frames.append({
                "camera": cam,
                "im": jnp.clip(out.rgb, 0.0, 1.0),
                "seg": jnp.clip(out.extra, 0.0, 1.0),
                "cam_id": jnp.int32(ci),
            })
        dataset.append(frames)
    return dataset, w2c_stack, cams


def init_point_cloud(scene: Dict, noise: float = 0.03, seed: int = 1
                     ) -> np.ndarray:
    """(N, 7) [xyz rgb seg] init cloud: GT points perturbed (like the
    reference's depth-lifted init clouds, imperfect but close)."""
    rng = np.random.RandomState(seed)
    xyz = scene["means"] + rng.normal(0, noise, scene["means"].shape)
    return np.concatenate([
        xyz, scene["colors"], scene["seg"][:, None]], axis=-1
    ).astype(np.float32)


def write_reference_layout(out_root: str, seq: str, num_t: int,
                           num_cams: int = 6, w: int = 128, h: int = 96,
                           f: float = 110.0, scene: Dict | None = None
                           ) -> str:
    """Materialize the synthetic scene ON DISK in the reference's layout.

    Produces exactly what train_beffor.py:19-136 consumes:
      <root>/<seq>/train_meta.json   md["fn"|"hw"|"k"|"w2c"][t][c]
      <root>/<seq>/ims/<c>/<t>.jpg   RGB frames
      <root>/<seq>/seg/<c>/<t>.png   {0,1} dynamic masks
      <root>/<seq>/init_pt_cld.npz   {"data": (N, 7) [xyz rgb seg]}

    so `cli train` (file path) -> `params.npz` -> `cli visualize` exercises
    the reference's complete file-in/file-out artifact flow.
    """
    import json

    from PIL import Image

    scene = scene or make_gt_scene()
    dataset, w2c_stack, cams = make_dataset(scene, num_t, num_cams=num_cams,
                                            w=w, h=h, f=f)
    base = os.path.join(out_root, seq)
    k_mat = [[f, 0.0, w / 2.0], [0.0, f, h / 2.0], [0.0, 0.0, 1.0]]
    md = {"fn": [], "hw": [[h, w]] * num_cams, "k": [], "w2c": []}
    for t in range(num_t):
        fns, ks, w2cs = [], [], []
        for c, frame in enumerate(dataset[t]):
            fn = f"{c}/{t:06d}.jpg"
            fns.append(fn)
            ks.append(k_mat)
            w2cs.append(np.asarray(w2c_stack[c], np.float64).tolist())
            im8 = (np.clip(np.asarray(frame["im"]), 0, 1)
                   * 255).astype(np.uint8)
            seg8 = ((np.asarray(frame["seg"])[..., 0] > 0.5)
                    * 255).astype(np.uint8)
            im_path = os.path.join(base, "ims", fn)
            seg_path = os.path.join(base, "seg", fn.replace(".jpg", ".png"))
            os.makedirs(os.path.dirname(im_path), exist_ok=True)
            os.makedirs(os.path.dirname(seg_path), exist_ok=True)
            Image.fromarray(im8).save(im_path, quality=95)
            Image.fromarray(seg8).save(seg_path)
        md["fn"].append(fns)
        md["k"].append(ks)
        md["w2c"].append(w2cs)
    with open(os.path.join(base, "train_meta.json"), "w") as fh:
        json.dump(md, fh)
    np.savez(os.path.join(base, "init_pt_cld.npz"),
             data=init_point_cloud(scene))
    return base
