"""Numerical debug harness for the renderer.

The reference wraps both CUDA entry points in try/except and dumps the full
CPU-copied argument tuple to snapshot_fw.dump / snapshot_bw.dump for offline
repro when `raster_settings.debug` is set
(diff_gaussian_rasterization/__init__.py:93-100,149-156) plus a CHECK_CUDA
sync-and-throw macro (auxiliary.h:172-179). XLA cannot throw mid-program, so
the TPU-native equivalent checks outputs for non-finite values AFTER the
(async) computation and dumps every render input to an .npz snapshot when
anything is wrong — same offline-repro workflow, deterministic programs.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from dynamic3dgaussians_tpu.ops.rasterize import render


def mark_visible(cam, means3d: jnp.ndarray) -> jnp.ndarray:
    """Frustum visibility query (the _C.mark_visible API,
    rasterize_points.cu:227-246): True where the point projects in front of
    the near plane."""
    V = cam.w2c
    mx, my, mz = means3d[..., 0], means3d[..., 1], means3d[..., 2]
    depth = V[2, 0] * mx + V[2, 1] * my + V[2, 2] * mz + V[2, 3]
    return depth > cam.near


def render_debug(cam, *args, snapshot_path: str = "snapshot_fw.npz",
                 **kwargs):
    """render() + non-finite output check + input snapshot on failure.

    Returns (output, ok). When ok is False the full input set has been
    written to `snapshot_path` for offline reproduction.
    """
    out = render(cam, *args, **kwargs)
    finite = (jnp.isfinite(out.rgb).all() & jnp.isfinite(out.depth).all()
              & jnp.isfinite(out.alpha).all())
    ok = bool(finite)
    overflow = int(out.n_dropped_capacity) + int(out.n_dropped_rect) \
        + int(out.n_dropped_tile_overflow)
    if not ok:
        blob = {f"arg_{i}": np.asarray(a) for i, a in enumerate(args)}
        blob.update({f"kw_{k}": np.asarray(v) for k, v in kwargs.items()
                     if hasattr(v, "shape")})
        blob["w2c"] = np.asarray(cam.w2c)
        blob["K"] = np.asarray([[float(cam.fx), 0, float(cam.cx)],
                                [0, float(cam.fy), float(cam.cy)],
                                [0, 0, 1]])
        np.savez(snapshot_path, **blob)
        print(f"[render_debug] non-finite output; inputs dumped to "
              f"{snapshot_path} (drop counters: {overflow})")
    return out, ok
