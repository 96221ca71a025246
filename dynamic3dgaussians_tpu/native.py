"""ctypes bindings for the native runtime library (native/src/d3g_native.cpp).

Provides:
  * `ply_write` / `ply_read` — binary splat-PLY codec (the external-viewer
    interchange format; reference helpers.py:40-67 writes it per-struct in
    Python).
  * `FileLoader` — threaded read-ahead file cache: `prefetch()` paths ahead
    of time from the training loop, `take()` blocks only if the bytes are
    not ready yet. Overlaps disk IO with the device step on single-core
    hosts.

The library builds on demand with `make -C native` (g++, no external deps);
every entry point falls back to pure Python/numpy when the .so is absent, so
the package never hard-depends on a compiled artifact.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_ROOT, "native", "libd3g_native.so")
_lib = None


def _load(build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and build:
        try:
            subprocess.run(["make", "-C", os.path.join(_ROOT, "native")],
                           check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.d3g_ply_write.restype = ctypes.c_int
    lib.d3g_ply_read_header.restype = ctypes.c_int64
    lib.d3g_ply_read_data.restype = ctypes.c_int
    lib.d3g_loader_create.restype = ctypes.c_void_p
    lib.d3g_loader_size.restype = ctypes.c_int64
    lib.d3g_loader_take.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _f32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, np.float32))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def ply_write(path: str, means, f_dc, logit_opacities, log_scales,
              quats) -> None:
    """Write a binary splat PLY (native fast path, numpy fallback)."""
    n = np.asarray(means).shape[0]
    lib = _load()
    if lib is not None:
        rc = lib.d3g_ply_write(
            path.encode(), ctypes.c_int64(n), _ptr(_f32(means)),
            _ptr(_f32(f_dc)), _ptr(_f32(logit_opacities).reshape(-1)),
            _ptr(_f32(log_scales)), _ptr(_f32(quats)))
        if rc != 0:
            raise IOError(f"d3g_ply_write({path}) failed: {rc}")
        return
    from dynamic3dgaussians_tpu.viz.export import C0, save_ply_splat
    save_ply_splat(path, _f32(means), _f32(log_scales), _f32(quats),
                   _f32(f_dc) * C0 + 0.5, _f32(logit_opacities))


_PLY_REQUIRED = ("x", "y", "z", "f_dc_0", "f_dc_1", "f_dc_2", "opacity",
                 "scale_0", "scale_1", "scale_2",
                 "rot_0", "rot_1", "rot_2", "rot_3")


def _ply_prop_names(path: str) -> list:
    """Float property names from the ASCII header (tiny, read in Python)."""
    names = []
    with open(path, "rb") as f:
        while True:
            line = f.readline()
            if not line or line.startswith(b"end_header"):
                break
            parts = line.decode("ascii", "replace").split()
            if len(parts) == 3 and parts[0] == "property":
                if parts[1] != "float":
                    raise IOError(
                        f"{path}: non-float property {parts[2]!r}; only "
                        "all-float32 splat PLYs are supported")
                names.append(parts[2])
    return names


def ply_read(path: str) -> dict:
    """Read a binary splat PLY -> dict of arrays.

    Columns are mapped by the header's property names (any all-float layout
    with the standard 3DGS field names works, including files carrying extra
    f_rest_* SH properties); a missing required property raises instead of
    silently misparsing.
    """
    names = _ply_prop_names(path)
    missing = [p for p in _PLY_REQUIRED if p not in names]
    if missing:
        raise IOError(f"{path}: PLY lacks required splat properties "
                      f"{missing}; found {names}")
    lib = _load()
    if lib is None:
        from dynamic3dgaussians_tpu.viz.export import load_ply_splat
        return load_ply_splat(path)
    props = ctypes.c_int(0)
    header = ctypes.c_int64(0)
    n = lib.d3g_ply_read_header(path.encode(), ctypes.byref(props),
                                ctypes.byref(header))
    if n < 0:
        raise IOError(f"cannot read {path}")
    if props.value != len(names):
        raise IOError(f"{path}: header/property mismatch "
                      f"({props.value} vs {len(names)})")
    data = np.empty((n, props.value), np.float32)
    rc = lib.d3g_ply_read_data(path.encode(), header, ctypes.c_int64(n),
                               props, _ptr(data))
    if rc != 0:
        raise IOError(f"d3g_ply_read_data({path}) failed: {rc}")
    col = {name: data[:, i] for i, name in enumerate(names)}

    def stack(*ns):
        return np.stack([col[x] for x in ns], axis=-1)

    return {"means3D": stack("x", "y", "z"),
            "f_dc": stack("f_dc_0", "f_dc_1", "f_dc_2"),
            "logit_opacities": col["opacity"][:, None],
            "log_scales": stack("scale_0", "scale_1", "scale_2"),
            "unnorm_rotations": stack("rot_0", "rot_1", "rot_2", "rot_3")}


class FileLoader:
    """Threaded read-ahead byte cache (native; falls back to sync reads)."""

    def __init__(self, n_threads: int = 2,
                 cache_limit_bytes: int = 1 << 30):
        self._lib = _load()
        self._h = None
        if self._lib is not None:
            self._h = ctypes.c_void_p(self._lib.d3g_loader_create(
                n_threads, ctypes.c_int64(cache_limit_bytes)))

    def prefetch(self, paths: Sequence[str]) -> None:
        if self._h is None:
            return
        for p in paths:
            self._lib.d3g_loader_prefetch(self._h, p.encode())

    def take(self, path: str) -> bytes:
        """Bytes of `path`; blocks until the background read completes."""
        if self._h is None:
            with open(path, "rb") as f:
                return f.read()
        size = self._lib.d3g_loader_size(self._h, path.encode())
        if size < 0:
            raise IOError(f"loader failed to read {path}")
        buf = np.empty(size, np.uint8)
        rc = self._lib.d3g_loader_take(
            self._h, path.encode(),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(size))
        if rc != 0:
            raise IOError(f"loader cache miss for {path}")
        return buf.tobytes()

    def close(self):
        if self._h is not None:
            self._lib.d3g_loader_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
