"""Offline visualization renders: orbits, depth colormaps, trajectories.

Capability parity with the reference's visualizer family (SURVEY.md P11/P12):
  * load stacked params.npz -> per-timestep render inputs
    (visualize_org.py:46-65 load_scene_data)
  * orbiting camera path (visualize_org.py:36-43) / slerp interpolation
  * batch novel-view renders to uint8 frames (visualize.py:238-377)
  * depth colormapping (visualize.py:34-40)
  * foreground trajectory "tails" (visualize_org.py:81-88) returned as line
    segments for any plotting backend (no Open3D dependency here).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.models.gaussians import activated
from dynamic3dgaussians_tpu.ops.camera import Camera, orbit_cameras
from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render


def params_at_t(stacked: Dict[str, np.ndarray], t: int) -> Dict[str, np.ndarray]:
    """Slice a stacked params.npz dict at timestep t (stacked keys have a
    leading T axis; t0-only keys are shared)."""
    out = {}
    n_t = stacked["means3D"].shape[0] if stacked["means3D"].ndim == 3 else 1
    for k, v in stacked.items():
        if v.ndim >= 2 and v.shape[0] == n_t and stacked["means3D"].ndim == 3:
            out[k] = v[t]
        else:
            out[k] = v
    return out


def render_frame(params_t: Dict[str, np.ndarray], cam: Camera,
                 config: Optional[RasterConfig] = None,
                 bg: Optional[np.ndarray] = None,
                 method: str = "tiled"):
    """Render one checkpointed timestep through the canonical API."""
    p = {k: jnp.asarray(v) for k, v in params_t.items()}
    act = activated(p)
    extra = p.get("seg_colors")
    return render(cam, act["means3d"], act["colors"], act["opacity"],
                  act["scales"], act["rotations"], extra_channels=extra,
                  bg=None if bg is None else jnp.asarray(bg),
                  config=config, method=method)


def to_uint8(img) -> np.ndarray:
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)


def colormap_depth(depth, alpha=None, near_clip: float = 1e-6) -> np.ndarray:
    """Turbo-free depth colormap: normalized inverse depth -> viridis-ish RGB
    via a fixed polynomial (no matplotlib dependency)."""
    d = np.asarray(depth, np.float64)
    a = np.ones_like(d) if alpha is None else np.asarray(alpha)
    valid = a > 0.5
    dn = d / np.maximum(a, near_clip)  # un-premultiply sum z*alpha*T
    if valid.any():
        lo, hi = np.percentile(dn[valid], [2, 98])
    else:
        lo, hi = 0.0, 1.0
    x = np.clip((dn - lo) / max(hi - lo, 1e-9), 0, 1)
    r = np.clip(1.5 - np.abs(2.0 * x - 1.5), 0, 1)
    g = np.clip(1.5 - np.abs(2.0 * x - 1.0), 0, 1)
    b = np.clip(1.5 - np.abs(2.0 * x - 0.5), 0, 1)
    rgb = np.stack([r, g, b], -1)
    rgb[~valid] = 0
    return (rgb * 255).astype(np.uint8)


def orbit_render(stacked: Dict[str, np.ndarray], n_frames: int = 60,
                 w: int = 640, h: int = 360, f: float = 500.0,
                 radius: float = 4.0, height: float = -1.0,
                 timestep_per_frame: bool = True,
                 config: Optional[RasterConfig] = None,
                 method: str = "tiled",
                 resort_every: int = 1) -> List[np.ndarray]:
    """360-degree orbit of the scene; cycles timesteps if available
    (visualize.py:238-377 style). Returns uint8 RGB frames.

    resort_every > 1 renders through the cached-order playback path
    (ops/playback.py): key frames re-derive the sort, in-between frames
    gather fresh records through the frozen order — the fps mode for the
    reference's visualizer-loop use case. Values stay current every frame;
    only depth order/tile membership lag by < resort_every orbit steps.
    Scale the interval with frame density: staleness error tracks image
    motion per key-frame interval, so a high-fps interactive loop
    (<1 deg/frame) tolerates resort_every=8+, while a coarse 30-60-frame
    GIF orbit should stay at 1-2 (tests/test_playback.py calibration).
    """
    num_t = stacked["means3D"].shape[0] if stacked["means3D"].ndim == 3 else 1
    center = np.asarray(stacked["means3D"]).reshape(-1, 3).mean(0)
    cams = orbit_cameras(center, radius, height, n_frames, w, h, f)
    frames = []
    cache = None
    cache_t = None
    since_sort = 0
    for i, cam in enumerate(cams):
        t = (i % num_t) if timestep_per_frame else 0
        pt = params_at_t(stacked, t)
        if resort_every > 1:
            from dynamic3dgaussians_tpu.ops.playback import (build_cache,
                                                             render_playback)
            p = {k: jnp.asarray(v) for k, v in pt.items()}
            act = activated(p)
            # the frozen order is only valid for SMALL camera deltas of the
            # SAME timestep: scene motion between timesteps is unbounded,
            # so a timestep change always re-sorts (an orbit that cycles
            # timesteps every frame gets no caching — correctly so)
            if cache is None or t != cache_t or since_sort >= resort_every:
                cache = build_cache(cam, act["means3d"], act["opacity"],
                                    act["scales"], act["rotations"],
                                    config=config)
                cache_t = t
                since_sort = 0
            since_sort += 1
            out = render_playback(cam, act["means3d"], act["colors"],
                                  act["opacity"], act["scales"],
                                  act["rotations"], cache, config=config,
                                  extra_channels=p.get("seg_colors"))
        else:
            out = render_frame(pt, cam, config=config, method=method)
        frames.append(to_uint8(out.rgb))
    return frames


def save_gif(frames: List[np.ndarray], path: str, fps: int = 20) -> str:
    from PIL import Image
    ims = [Image.fromarray(f) for f in frames]
    ims[0].save(path, save_all=True, append_images=ims[1:],
                duration=int(1000 / fps), loop=0)
    return path


def trajectory_lines(stacked: Dict[str, np.ndarray], t: int,
                     traj_length: int = 15, stride: int = 25,
                     fg_thresh: float = 0.5):
    """Foreground trajectory tails as (S, 2, 3) line segments
    (visualize_org.py:81-88: every `stride`-th fg point, last `traj_length`
    timesteps)."""
    means = np.asarray(stacked["means3D"])         # (T, N, 3)
    seg = np.asarray(stacked["seg_colors"])
    is_fg = seg[..., 0] > fg_thresh if seg.ndim == 2 else seg[0, :, 0] > fg_thresh
    pts = means[:, is_fg][:, ::stride]             # (T, S, 3)
    t0 = max(0, t - traj_length)
    segs = []
    for a in range(t0, t):
        segs.append(np.stack([pts[a], pts[a + 1]], axis=1))
    return np.concatenate(segs, axis=0) if segs else np.zeros((0, 2, 3))


def rotation_vector_lines(stacked: Dict[str, np.ndarray], t: int,
                          length: float = 0.05, stride: int = 25,
                          fg_thresh: float = 0.5):
    """Per-gaussian orientation whiskers as (S, 2, 3) line segments
    (visualize_org.py:91-106: rotate a fixed offset by the RELATIVE quat
    between t=0 and t, anchored at the current centers)."""
    from dynamic3dgaussians_tpu.ops import quat as Q

    means = np.asarray(stacked["means3D"])          # (T, N, 3)
    rots = np.asarray(stacked["unnorm_rotations"])  # (T, N, 4)
    seg = np.asarray(stacked["seg_colors"])
    is_fg = seg[..., 0] > fg_thresh if seg.ndim == 2 \
        else seg[0, :, 0] > fg_thresh
    sel = np.where(is_fg)[0][::stride]
    q_t = rots[t, sel] / np.maximum(
        np.linalg.norm(rots[t, sel], axis=-1, keepdims=True), 1e-9)
    q_0 = rots[0, sel] / np.maximum(
        np.linalg.norm(rots[0, sel], axis=-1, keepdims=True), 1e-9)
    # relative rotation q_t * conj(q_0)
    import jax.numpy as jnp
    rel = np.asarray(Q.quat_mult(jnp.asarray(q_t),
                                 Q.conjugate(jnp.asarray(q_0))))
    R = np.asarray(Q.quat_to_rotmat(jnp.asarray(rel)))
    offset = R @ np.array([0.0, 0.0, length], np.float64)
    starts = means[t, sel]
    return np.stack([starts, starts + offset], axis=1)


def rgbd_to_pointcloud(rgb: np.ndarray, depth: np.ndarray, k: np.ndarray,
                       alpha: np.ndarray = None, c2w: np.ndarray = None,
                       alpha_thresh: float = 0.5):
    """Lift a rendered RGB-D image to a colored point cloud
    (visualize_org.py:116-136 rgbd2pcd: inverse-intrinsics ray lift of the
    un-premultiplied depth). Returns (points (M, 3), colors (M, 3))."""
    h, w = depth.shape
    a = np.ones_like(depth) if alpha is None else np.asarray(alpha)
    z = np.asarray(depth) / np.maximum(a, 1e-6)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64) + 0.5
    x = (xs - k[0][2]) / k[0][0] * z
    y = (ys - k[1][2]) / k[1][1] * z
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    cols = np.asarray(rgb).reshape(-1, 3)
    keep = (a > alpha_thresh).reshape(-1)
    pts, cols = pts[keep], cols[keep]
    if c2w is not None:
        pts = pts @ np.asarray(c2w)[:3, :3].T + np.asarray(c2w)[:3, 3]
    return pts, cols


def draw_lines(img: np.ndarray, segments: np.ndarray, cam: Camera,
               color=(255, 60, 60)) -> np.ndarray:
    """Project 3D line segments into a uint8 image and draw them
    (the headless stand-in for the reference's Open3D linesets)."""
    out = img.copy()
    h, w = out.shape[:2]
    w2c = np.asarray(cam.w2c)
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)

    def proj(p):
        v = w2c[:3, :3] @ p + w2c[:3, 3]
        if v[2] <= 1e-6:
            return None
        return np.array([v[0] / v[2] * fx + cx, v[1] / v[2] * fy + cy])

    for a, b in segments:
        pa, pb = proj(a), proj(b)
        if pa is None or pb is None:
            continue
        n = int(max(abs(pb - pa).max(), 1)) + 1
        ts = np.linspace(0, 1, n)
        xs = np.clip((pa[0] + (pb[0] - pa[0]) * ts).astype(int), 0, w - 1)
        ys = np.clip((pa[1] + (pb[1] - pa[1]) * ts).astype(int), 0, h - 1)
        out[ys, xs] = color
    return out


def playback(stacked: Dict[str, np.ndarray], cam: Camera, fps: float = 20.0,
             mode: str = "color", show_trajectories: bool = False,
             show_rotations: bool = False,
             config: Optional[RasterConfig] = None,
             max_frames: Optional[int] = None, realtime: bool = False):
    """Wall-clock-paced playback generator (visualize_org.py:168-191).

    Yields uint8 frames per timestep at `fps` (sleeping only when
    `realtime`); `mode` in {color, depth, centers} mirrors the reference's
    view modes (visualize_org.py:11-23).
    """
    import time as _time

    num_t = stacked["means3D"].shape[0] if stacked["means3D"].ndim == 3 else 1
    n = num_t if max_frames is None else min(num_t, max_frames)
    period = 1.0 / fps
    nxt = _time.perf_counter()
    for t in range(n):
        out = render_frame(params_at_t(stacked, t), cam, config=config)
        if mode == "depth":
            frame = colormap_depth(np.asarray(out.depth),
                                   np.asarray(out.alpha))
        elif mode == "centers":
            pts = np.asarray(stacked["means3D"])
            pts_t = pts[t] if pts.ndim == 3 else pts
            segs = np.stack([pts_t, pts_t + 1e-4], axis=1)
            frame = draw_lines(
                np.zeros((cam.height, cam.width, 3), np.uint8), segs, cam,
                color=(220, 220, 220))
        else:
            frame = to_uint8(out.rgb)
        if show_trajectories and stacked["means3D"].ndim == 3:
            frame = draw_lines(frame, trajectory_lines(stacked, t), cam)
        if show_rotations and stacked["means3D"].ndim == 3:
            frame = draw_lines(frame, rotation_vector_lines(stacked, t),
                               cam, color=(60, 120, 255))
        if realtime:
            nxt += period
            delay = nxt - _time.perf_counter()
            if delay > 0:
                _time.sleep(delay)
        yield frame
