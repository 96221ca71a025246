"""Remote-viewer TCP protocol server (SIBR-viewer compatible wire format).

Capability parity with reference gaussian_renderer/network_gui.py (SURVEY.md
§2.2 P8): a non-blocking localhost TCP listener speaking the 3DGS remote-GUI
protocol —

  handshake:  uint32 length + JSON list of render_items        (:35-44)
  request:    uint32 length + JSON {resolution_x/y, train, fov_x/y,
              z_near/far, keep_alive, scaling_modifier, view_matrix,
              view_projection_matrix, render_mode}              (:56-91)
  response:   raw RGB bytes (H*W*3 uint8), uint32 length + ascii verify
              string, uint32 length + JSON metrics              (:63-69)

The camera comes in as view / view-projection matrices with the viewer's
y/z flips (:85-88), converted here to our Camera. The render callback is
pluggable, so the trainer can serve live renders mid-optimization
(revise_train.py:152-174 loop).
"""

from __future__ import annotations

import json
import socket
import struct
from typing import Callable, List, Optional

import numpy as np

from dynamic3dgaussians_tpu.ops.camera import Camera


DEFAULT_RENDER_ITEMS = ["RGB", "Depth", "Alpha", "Segmentation"]


def camera_from_viewer(width, height, fovx, fovy, znear, zfar,
                       view_matrix, view_projection_matrix) -> Camera:
    """Viewer matrices -> Camera (MiniCam equivalent, scene/cameras.py:60-72).

    The viewer sends row-vector-convention (transposed) matrices with y/z
    sign flips on columns 1/2 (network_gui.py:85-88).
    """
    vm = np.asarray(view_matrix, np.float32).reshape(4, 4)
    vp = np.asarray(view_projection_matrix, np.float32).reshape(4, 4)
    vm[:, 1] *= -1
    vm[:, 2] *= -1
    vp[:, 1] *= -1
    w2c = vm.T  # stored transposed in the protocol
    full_proj = vp.T
    import jax.numpy as jnp
    fx = width / (2.0 * np.tan(fovx / 2.0))
    fy = height / (2.0 * np.tan(fovy / 2.0))
    c2w = np.linalg.inv(w2c)
    proj = full_proj @ np.linalg.inv(w2c)
    return Camera(w2c=jnp.asarray(w2c), proj=jnp.asarray(proj),
                  full_proj=jnp.asarray(full_proj),
                  cam_center=jnp.asarray(c2w[:3, 3]),
                  fx=jnp.float32(fx), fy=jnp.float32(fy),
                  cx=jnp.float32(width / 2), cy=jnp.float32(height / 2),
                  height=int(height), width=int(width),
                  near=float(znear), far=float(zfar))


class NetworkGUI:
    """Non-blocking render server; call `poll` from the training loop."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6009,
                 render_items: Optional[List[str]] = None):
        self.render_items = render_items or list(DEFAULT_RENDER_ITEMS)
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    # --- wire helpers (network_gui.py:35-53) ---
    def _send_json(self, data) -> None:
        payload = json.dumps(data).encode("utf-8")
        self.conn.sendall(struct.pack("I", len(payload)))
        self.conn.sendall(payload)

    def _read_json(self):
        n = int.from_bytes(self._recv_exact(4), "little")
        return json.loads(self._recv_exact(n).decode("utf-8"))

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def try_connect(self) -> bool:
        if self.conn is not None:
            return True
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
            self._send_json(self.render_items)
            return True
        except (BlockingIOError, socket.timeout):
            return False

    def poll(self, render_fn: Callable, metrics_fn: Callable = None,
             verify: str = "ok") -> Optional[bool]:
        """Serve one request if a viewer is connected.

        render_fn(camera, render_mode, scaling_modifier) -> (H, W, 3) float
        image in [0,1] or None. Returns the request's `train` flag, or None
        if no viewer/request. Mirrors the serve loop of revise_train.py:152-174.
        """
        if not self.try_connect():
            return None
        try:
            msg = self._read_json()
            width, height = msg["resolution_x"], msg["resolution_y"]
            if width == 0 or height == 0:
                return None
            cam = camera_from_viewer(
                width, height, msg["fov_x"], msg["fov_y"], msg["z_near"],
                msg["z_far"], msg["view_matrix"],
                msg["view_projection_matrix"])
            img = render_fn(cam, msg.get("render_mode", "RGB"),
                            msg.get("scaling_modifier", 1.0))
            payload = None
            if img is not None:
                arr = np.asarray(img)
                payload = (np.clip(arr, 0, 1) * 255).astype(np.uint8) \
                    .tobytes()
            if payload is not None:
                self.conn.sendall(payload)
            self.conn.sendall(len(verify).to_bytes(4, "little"))
            self.conn.sendall(verify.encode("ascii"))
            self._send_json(metrics_fn() if metrics_fn else {})
            return bool(msg.get("train", True))
        except (ConnectionError, OSError):
            self.conn = None
            return None

    def close(self):
        if self.conn is not None:
            self.conn.close()
        self.listener.close()
