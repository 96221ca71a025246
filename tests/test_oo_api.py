"""OO GaussianModel API + network GUI protocol loopback."""

import json
import os
import socket
import struct
import threading

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.models.gaussian_model import GaussianModel, expon_lr
from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
from dynamic3dgaussians_tpu.viz.network_gui import NetworkGUI
from tests.scenes import lookat_camera


CFG = RasterConfig(chunk=64, max_per_tile=256, max_tiles_per_gaussian=64,
                   pairs_per_gaussian=32)


def _model(n=80, sh_degree=2, semantic_dim=0):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return GaussianModel(sh_degree, semantic_dim).create_from_pcd(
        pts, cols, spatial_lr_scale=2.0, capacity=128).training_setup()


def test_create_and_render():
    m = _model()
    cam, _, _ = lookat_camera()
    out = render(cam, **m.render_args(), config=CFG)
    assert out.rgb.shape == (48, 64, 3)
    assert float(out.alpha.max()) > 0.1
    assert m.num_points == 80


def test_sh_degree_progression():
    m = _model(sh_degree=3)
    assert m.get_features.shape == (128, 16, 3)
    assert m.active_sh_degree == 0
    m.oneupSHdegree()
    assert m.active_sh_degree == 1


def test_training_step_and_densify():
    m = _model()
    cam, _, _ = lookat_camera(w=32, h=32)
    target = jnp.zeros((32, 32, 3))

    def loss_fn(params):
        m2 = GaussianModel(m.max_sh_degree)
        m2.params, m2.variables = params, m.variables
        m2.active_sh_degree = m.active_sh_degree
        out = render(cam, **m2.render_args(), config=CFG)
        return jnp.mean((out.rgb - target) ** 2)

    l0 = float(loss_fn(m.params))
    for _ in range(5):
        grads = jax.grad(loss_fn)(m.params)
        m.step(grads)
    assert float(loss_fn(m.params)) < l0

    n0 = m.num_points
    m.variables["means2D_gradient_accum"] = jnp.ones(128)
    m.variables["denom"] = jnp.ones(128)
    stats = m.densify_and_prune(600)
    assert int(stats.n_cloned) + int(stats.n_split) > 0
    m.reset_opacity()
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(m.params["logit_opacities"])), 0.01,
        atol=1e-5)


def test_capture_restore_roundtrip():
    m = _model()
    m.step({k: jnp.ones_like(v) * 1e-3 for k, v in m.params.items()})
    state = m.capture()
    m2 = GaussianModel(m.max_sh_degree).restore(state)
    for k in m.params:
        np.testing.assert_allclose(np.asarray(m2.params[k]),
                                   np.asarray(m.params[k]))
    np.testing.assert_allclose(np.asarray(m2.opt_state.mu["means3D"]),
                               np.asarray(m.opt_state.mu["means3D"]))
    assert m2.step_count == m.step_count


def test_expon_lr_schedule():
    assert abs(expon_lr(0, 1e-2, 1e-4, max_steps=100) - 1e-2) < 1e-9
    assert abs(expon_lr(100, 1e-2, 1e-4, max_steps=100) - 1e-4) < 1e-9
    mid = expon_lr(50, 1e-2, 1e-4, max_steps=100)
    assert 1e-4 < mid < 1e-2


def test_network_gui_loopback():
    """Drive the full wire protocol against a fake viewer client."""
    m = _model(n=40)
    cam0, _, _ = lookat_camera(w=32, h=24)
    gui = NetworkGUI(port=0 or 16009)

    def render_fn(cam, mode, scale_mod):
        out = render(cam, **m.render_args(), config=CFG)
        return np.asarray(out.rgb)

    result = {}

    def client():
        s = socket.create_connection(("127.0.0.1", 16009), timeout=10)
        n = int.from_bytes(_recv(s, 4), "little")
        result["items"] = json.loads(_recv(s, n))
        w2c = np.asarray(cam0.w2c)
        vm = w2c.T.copy()
        vm[:, 1] *= -1
        vm[:, 2] *= -1
        vp = (np.asarray(cam0.full_proj)).T.copy()
        vp[:, 1] *= -1
        msg = {"resolution_x": 32, "resolution_y": 24, "train": True,
               "fov_x": 2 * np.arctan(32 / (2 * 60.0)),
               "fov_y": 2 * np.arctan(24 / (2 * 60.0)),
               "z_near": 0.01, "z_far": 100.0, "keep_alive": True,
               "scaling_modifier": 1.0, "render_mode": "RGB",
               "view_matrix": vm.flatten().tolist(),
               "view_projection_matrix": vp.flatten().tolist()}
        payload = json.dumps(msg).encode()
        s.sendall(struct.pack("I", len(payload)))
        s.sendall(payload)
        result["img"] = _recv(s, 24 * 32 * 3)
        vn = int.from_bytes(_recv(s, 4), "little")
        result["verify"] = _recv(s, vn).decode()
        mn = int.from_bytes(_recv(s, 4), "little")
        result["metrics"] = json.loads(_recv(s, mn))
        s.close()

    def _recv(s, n):
        buf = b""
        while len(buf) < n:
            buf += s.recv(n - len(buf))
        return buf

    th = threading.Thread(target=client)
    th.start()
    import time
    for _ in range(200):
        flag = gui.poll(render_fn, metrics_fn=lambda: {"iter": 7})
        if flag is not None:
            break
        time.sleep(0.01)
    th.join(timeout=10)
    gui.close()
    assert result["items"] == ["RGB", "Depth", "Alpha", "Segmentation"]
    assert len(result["img"]) == 24 * 32 * 3
    assert result["metrics"] == {"iter": 7}
    img = np.frombuffer(result["img"], np.uint8)
    assert img.max() > 0


def test_scene_save_and_reload(tmp_path):
    from dynamic3dgaussians_tpu.models.gaussian_model import GaussianModel
    from dynamic3dgaussians_tpu.models.scene import Scene
    rng = np.random.RandomState(0)
    cloud = np.concatenate([rng.uniform(-1, 1, (50, 3)),
                            rng.rand(50, 3)], 1).astype(np.float32)
    g = GaussianModel(sh_degree=2)
    sc = Scene(g, model_path=str(tmp_path), point_cloud=cloud, capacity=128)
    assert g.num_points == 50
    d = sc.save(100)
    assert os.path.exists(os.path.join(d, "point_cloud.ply"))
    g2 = GaussianModel(sh_degree=2)
    sc2 = Scene(g2, model_path=str(tmp_path), load_iteration=-1)
    assert sc2.loaded_iter == 100 and g2.num_points == 50
    np.testing.assert_allclose(np.asarray(g2.params["means3D"])[:50],
                               cloud[:, :3], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g2.params["features_dc"])[:50, 0],
        np.asarray(g.params["features_dc"])[:50, 0], atol=1e-6)


def test_scene_from_colmap(tmp_path):
    import struct
    from dynamic3dgaussians_tpu.models.gaussian_model import GaussianModel
    from dynamic3dgaussians_tpu.models.scene import scene_from_colmap
    d = tmp_path / "sparse" / "0"
    os.makedirs(d)
    with open(d / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        f.write(struct.pack("<dddd", 50.0, 50.0, 32.0, 24.0))
    with open(d / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            f.write(struct.pack("<idddddddi", i + 1, 1.0, 0, 0, 0,
                                0.1 * i, 0, 3.0, 1))
            f.write(f"im{i}.jpg\x00".encode())
            f.write(struct.pack("<Q", 0))
    with open(d / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            f.write(struct.pack("<QdddBBBd", i + 1, 0.1 * i, 0.2, 0.3,
                                100, 150, 200, 0.5))
            f.write(struct.pack("<Q", 0))
    g = GaussianModel(sh_degree=1)
    sc = scene_from_colmap(str(tmp_path), g, model_path=str(tmp_path / "out"),
                           capacity=128)
    assert len(sc.getTrainCameras()) == 2
    assert g.num_points == 3
