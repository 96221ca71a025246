"""Checkpoint and splat export, byte-compatible with the reference formats.

Capability parity:
  * save_params / stacked params.npz layout   (reference helpers.py:158-167:
    keys present at every timestep are stacked along a leading T axis; t0-only
    keys are stored unstacked) — the reference's visualizers and metrics read
    exactly this file, so ours can feed them directly.
  * save_params_progressively                 (helpers.py:169-186)
  * PLY "splat" export for external viewers   (helpers.py:40-67): the 3DGS
    vertex layout x/y/z, nx/ny/nz, f_dc_*, opacity, scale_*, rot_*, with
    rgb -> SH-DC conversion.
  * load_params                               (visualize_org.py:46-65 input).

Pure NumPy on the host; no torch, no plyfile dependency (we write the binary
PLY header by hand).
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from dynamic3dgaussians_tpu.ops.sh import C0


def rgb_to_sh_np(rgb: np.ndarray) -> np.ndarray:
    return (rgb - 0.5) / C0


def save_params(output_params: List[Dict[str, np.ndarray]], out_dir: str,
                filename: str = "params") -> str:
    """Stack per-timestep host param dicts into one npz (helpers.py:158-167)."""
    to_save = {}
    later_keys = set(output_params[1].keys()) if len(output_params) > 1 \
        else set(output_params[0].keys())
    for k in output_params[0].keys():
        if k in later_keys:
            to_save[k] = np.stack([p[k] for p in output_params])
        else:
            to_save[k] = output_params[0][k]
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, filename)
    np.savez(path, **to_save)
    return path + ".npz"


def load_params(path: str) -> Dict[str, np.ndarray]:
    data = np.load(path)
    return {k: data[k] for k in data.files}


def save_ply_splat(path: str, means: np.ndarray, log_scales: np.ndarray,
                   rotations: np.ndarray, rgbs: np.ndarray,
                   opacities: np.ndarray, normals: np.ndarray = None) -> str:
    """Binary-little-endian 3DGS PLY (helpers.py:40-67 layout)."""
    n = means.shape[0]
    if normals is None:
        normals = np.zeros_like(means)
    if log_scales.shape[1] == 1:
        log_scales = np.tile(log_scales, (1, 3))
    colors = rgb_to_sh_np(rgbs)
    attrs = np.concatenate([
        means, normals, colors, opacities.reshape(n, -1)[:, :1],
        log_scales, rotations], axis=1).astype("<f4")
    names = ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2",
             "opacity", "scale_0", "scale_1", "scale_2",
             "rot_0", "rot_1", "rot_2", "rot_3"]
    assert attrs.shape[1] == len(names)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {name}" for name in names]
    header += ["end_header", ""]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(attrs.tobytes())
    return path


def load_ply_splat(path: str) -> Dict[str, np.ndarray]:
    """Read back the PLY layout written by save_ply_splat."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode("ascii").splitlines()
        n = next(int(l.split()[-1]) for l in lines
                 if l.startswith("element vertex"))
        names = [l.split()[-1] for l in lines if l.startswith("property")]
        data = np.frombuffer(f.read(), dtype="<f4").reshape(n, len(names))
    cols = {name: data[:, i] for i, name in enumerate(names)}
    return {
        "means3D": np.stack([cols["x"], cols["y"], cols["z"]], -1),
        "rgb_colors": np.stack([cols["f_dc_0"], cols["f_dc_1"],
                                cols["f_dc_2"]], -1) * C0 + 0.5,
        "logit_opacities": cols["opacity"][:, None],
        "log_scales": np.stack([cols["scale_0"], cols["scale_1"],
                                cols["scale_2"]], -1),
        "unnorm_rotations": np.stack([cols["rot_0"], cols["rot_1"],
                                      cols["rot_2"], cols["rot_3"]], -1),
    }


def save_params_progressively(params_cpu: Dict[str, np.ndarray], out_dir: str,
                              iteration: int) -> None:
    """Progressive npz + PLY dumps (helpers.py:169-186, ssd_train.py:726-729)."""
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, f"params_iter_{iteration}"), **params_cpu)
    save_ply_splat(
        os.path.join(out_dir, f"iter_{iteration}points.ply"),
        params_cpu["means3D"], params_cpu["log_scales"],
        params_cpu["unnorm_rotations"], params_cpu["rgb_colors"],
        params_cpu["logit_opacities"])
