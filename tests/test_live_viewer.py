"""Live viewer: HTTP orbit server over a checkpoint + network-GUI client.

Covers VERDICT r1 item 2/9: the interactive surface a human can actually
orbit in (reference visualize_org.py:139-191) — here exercised headlessly
through real HTTP and TCP round trips.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig
from dynamic3dgaussians_tpu.viz import live_viewer


def _toy_stacked(num_t=3, n=60, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    drift = rng.normal(0, 0.02, (num_t, 1, 3)).astype(np.float32).cumsum(0)
    quats = rng.normal(size=(num_t, n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    return {
        "means3D": base[None] + drift,
        "unnorm_rotations": quats,
        "rgb_colors": np.tile(rng.uniform(0, 1, (n, 3)).astype(np.float32),
                              (num_t, 1, 1)),
        "seg_colors": np.stack([
            (np.arange(n) % 2).astype(np.float32),
            np.zeros(n, np.float32), np.zeros(n, np.float32)], -1),
        "logit_opacities": rng.uniform(0.5, 2.0, (n, 1)).astype(np.float32),
        "log_scales": np.log(rng.uniform(0.05, 0.12, (n, 3))
                             ).astype(np.float32),
    }


@pytest.fixture(scope="module")
def viewer_server():
    cfg = RasterConfig(tile_h=8, tile_w=8, chunk=64, max_per_tile=256,
                       max_tiles_per_gaussian=16, pairs_per_gaussian=16)
    src = live_viewer.CheckpointSource(_toy_stacked(), config=cfg)
    srv = live_viewer.make_server(src, port=0, w=64, h=48, f=50.0)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_viewer_serves_page_and_meta(viewer_server):
    status, ctype, body = _get(viewer_server + "/")
    assert status == 200 and "text/html" in ctype
    assert b"frame?az=" in body  # the orbit client is embedded
    status, _, body = _get(viewer_server + "/meta")
    meta = json.loads(body)
    assert meta["num_timesteps"] == 3
    assert len(meta["center"]) == 3 and meta["radius"] > 0


@pytest.mark.parametrize("mode", ["rgb", "depth", "seg", "centers"])
def test_viewer_renders_every_mode(viewer_server, mode):
    from PIL import Image
    import io
    status, ctype, body = _get(
        viewer_server + f"/frame?az=0.7&el=0.3&r=4.0&t=1&mode={mode}")
    assert status == 200 and ctype == "image/jpeg", body[:200]
    img = np.asarray(Image.open(io.BytesIO(body)))
    assert img.shape == (48, 64, 3)
    assert img.any(), f"mode {mode} rendered an all-black frame"


def test_viewer_trajectory_overlay_and_timestep_clamp(viewer_server):
    status, ctype, _ = _get(
        viewer_server + "/frame?az=0&el=0.2&r=4&t=99&mode=rgb&traj=1")
    assert status == 200 and ctype == "image/jpeg"


def test_gui_client_round_trip():
    """GuiClient <-> NetworkGUI over loopback: the client's camera encoding
    must survive the server's camera_from_viewer decode."""
    from dynamic3dgaussians_tpu.viz.network_gui import NetworkGUI

    # NetworkGUI binds a fixed port; pick a free one explicitly
    import socket as socklib
    s = socklib.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    gui = NetworkGUI(port=port)

    seen = {}

    def render_fn(cam, render_mode, scaling_modifier):
        seen["cam"] = cam
        seen["mode"] = render_mode
        h, w = cam.height, cam.width
        img = np.zeros((h, w, 3), np.float32)
        img[..., 0] = 0.5
        return img

    def server_loop():
        import time
        for _ in range(200):
            if gui.poll(render_fn, metrics_fn=lambda: {"it": 7}) is not None:
                return
            time.sleep(0.05)

    th = threading.Thread(target=server_loop, daemon=True)
    th.start()

    cam = live_viewer.orbit_camera([0, 0, 0], az=0.5, el=0.2, radius=3.0,
                                   w=32, h=24, f=30.0)
    client = live_viewer.GuiClient(port=port)
    assert isinstance(client.render_items, list)
    img, metrics = client.request(cam, render_mode="Depth")
    th.join(timeout=10)
    client.close()
    gui.close()

    assert img.shape == (24, 32, 3)
    assert (img[..., 0] == 127).all() and (img[..., 1] == 0).all()
    assert metrics == {"it": 7}
    assert seen["mode"] == "Depth"
    # the decoded camera matches what we encoded (flips are involutions)
    np.testing.assert_allclose(np.asarray(seen["cam"].w2c),
                               np.asarray(cam.w2c), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seen["cam"].full_proj),
                               np.asarray(cam.full_proj), atol=1e-4)
    assert seen["cam"].width == 32 and seen["cam"].height == 24


def test_gui_client_source_meta():
    """GuiClientSource bridges meta + frames through the TCP protocol."""
    from dynamic3dgaussians_tpu.viz.network_gui import NetworkGUI
    import socket as socklib
    s = socklib.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    gui = NetworkGUI(port=port)

    def server_loop():
        def render_fn(cam, mode, sm):
            return np.full((cam.height, cam.width, 3), 0.25, np.float32)
        import time
        for _ in range(200):
            if gui.poll(render_fn) is not None:
                return
            time.sleep(0.05)

    th = threading.Thread(target=server_loop, daemon=True)
    th.start()
    src = live_viewer.GuiClientSource("127.0.0.1", port, radius=5.0)
    meta = src.meta()
    assert meta["radius"] == 5.0 and "render_items" in meta
    cam = live_viewer.orbit_camera([0, 0, 0], 0.0, 0.0, 5.0, 16, 8, 10.0)
    img = src.frame(cam, 0, "rgb", False)
    th.join(timeout=10)
    gui.close()
    assert img.shape == (8, 16, 3) and (img == 63).all()
