"""Reference-format dataset reader (Dynamic3DGaussians data layout).

Reads the exact on-disk layout the reference trains on
(train_beffor.py:19-102, initialize_params:112-136):

  <root>/<seq>/train_meta.json     md["fn"|"hw"|"k"|"w2c"][t][c]
  <root>/<seq>/ims/<fn>            RGB jpg/png
  <root>/<seq>/seg/<fn .png>       grayscale {0,1} dynamic mask
  <root>/<seq>/init_pt_cld.npz     {"data": (N, 7) [xyz rgb seg]}
  optional <root>/<seq>/depth/<c>/depth_<t>.npz  {"depth_map": (H, W)}

Images load lazily per timestep (the reference reloads every timestep too);
arrays come back channels-last float32 in [0, 1].
"""

from __future__ import annotations

import io
import json
import os
from typing import Dict, List, Optional

import numpy as np


def _load_image(path: str, loader=None) -> np.ndarray:
    from PIL import Image
    if loader is not None:
        img = Image.open(io.BytesIO(loader.take(path)))
    else:
        img = Image.open(path)
    return np.asarray(img, dtype=np.float32) / 255.0


def timestep_paths(root: str, seq: str, md: Dict, t: int) -> List[str]:
    """Every file load_timestep(t) will touch — feed to a prefetcher."""
    paths = []
    for c in range(len(md["fn"][t])):
        fn = md["fn"][t][c]
        paths.append(os.path.join(root, seq, "ims", fn))
        paths.append(os.path.join(root, seq, "seg",
                                  fn.replace(".jpg", ".png")))
    return paths


def load_meta(root: str, seq: str) -> Dict:
    with open(os.path.join(root, seq, "train_meta.json")) as f:
        return json.load(f)


def load_init_point_cloud(root: str, seq: str,
                          filename: str = "init_pt_cld.npz") -> np.ndarray:
    return np.load(os.path.join(root, seq, filename))["data"]


def load_timestep(root: str, seq: str, md: Dict, t: int,
                  cameras: Optional[List[int]] = None,
                  load_depth: bool = False, loader=None,
                  prefetch_next: bool = False) -> List[Dict]:
    """Build the trainer's per-timestep camera datapoint list.

    `loader`: optional native.FileLoader — image bytes stream in from its
    background threads; with `prefetch_next`, timestep t+1's files are queued
    before t's are decoded so disk IO overlaps the device step (the reference
    loads every image synchronously, train_beffor.py:19-102).
    Returns dicts with numpy arrays; convert with `to_device` before training.
    """
    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.ops.camera import make_camera

    if loader is not None and prefetch_next and t + 1 < len(md["fn"]):
        loader.prefetch(timestep_paths(root, seq, md, t + 1))
    frames = []
    cam_ids = cameras if cameras is not None else range(len(md["fn"][t]))
    for c in cam_ids:
        h, w = md["hw"][c]
        k = np.asarray(md["k"][t][c], np.float64)
        w2c = np.asarray(md["w2c"][t][c], np.float64)
        fn = md["fn"][t][c]
        im = _load_image(os.path.join(root, seq, "ims", fn), loader)
        seg_path = os.path.join(root, seq, "seg",
                                fn.replace(".jpg", ".png"))
        seg = _load_image(seg_path, loader)
        if seg.ndim == 3:
            seg = seg[..., 0]
        seg = (seg > 0.5).astype(np.float32)
        seg_col = np.stack([seg, np.zeros_like(seg), 1.0 - seg], axis=-1)
        frame = {
            "camera": make_camera(w, h, k, w2c, near=0.01, far=100.0),
            "im": jnp.asarray(im[..., :3]),
            "seg": jnp.asarray(seg_col),
            "cam_id": jnp.int32(c),
        }
        if load_depth:
            dpath = os.path.join(root, seq, "depth", str(int(c)),
                                 f"depth_{t}.npz")
            if os.path.exists(dpath):
                frame["gt_depth"] = jnp.asarray(
                    np.load(dpath)["depth_map"].astype(np.float32))
        frames.append(frame)
    return frames


def scene_w2c_stack(md: Dict, t: int = 0) -> np.ndarray:
    """(C, 4, 4) extrinsics at timestep t (scene-radius estimate input)."""
    return np.asarray(md["w2c"][t], np.float64)
