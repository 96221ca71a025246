"""Native C++ runtime library: splat-PLY codec + threaded file loader."""

import os

import numpy as np
import pytest

from dynamic3dgaussians_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native library not buildable in this environment")
    return True


def test_ply_roundtrip_native(lib_ok, tmp_path):
    rng = np.random.RandomState(0)
    n = 333
    means = rng.randn(n, 3).astype(np.float32)
    f_dc = rng.randn(n, 3).astype(np.float32)
    op = rng.randn(n).astype(np.float32)
    ls = rng.randn(n, 3).astype(np.float32)
    q = rng.randn(n, 4).astype(np.float32)
    p = str(tmp_path / "s.ply")
    native.ply_write(p, means, f_dc, op, ls, q)
    back = native.ply_read(p)
    np.testing.assert_allclose(back["means3D"], means)
    np.testing.assert_allclose(back["f_dc"], f_dc)
    np.testing.assert_allclose(back["logit_opacities"][:, 0], op)
    np.testing.assert_allclose(back["log_scales"], ls)
    np.testing.assert_allclose(back["unnorm_rotations"], q)


def test_ply_native_matches_python_writer(lib_ok, tmp_path):
    """Native codec and the python export agree on the byte format."""
    from dynamic3dgaussians_tpu.viz.export import (C0, load_ply_splat,
                                                   save_ply_splat)
    rng = np.random.RandomState(1)
    n = 64
    means = rng.randn(n, 3).astype(np.float32)
    rgb = rng.rand(n, 3).astype(np.float32)
    op = rng.randn(n, 1).astype(np.float32)
    ls = rng.randn(n, 3).astype(np.float32)
    q = rng.randn(n, 4).astype(np.float32)
    p_py = str(tmp_path / "py.ply")
    p_nat = str(tmp_path / "nat.ply")
    save_ply_splat(p_py, means, ls, q, rgb, op)
    native.ply_write(p_nat, means, (rgb - 0.5) / C0, op[:, 0], ls, q)
    a, b = load_ply_splat(p_py), load_ply_splat(p_nat)
    for k in a:
        np.testing.assert_allclose(b[k], a[k], atol=1e-5)
    # and the native reader parses the python writer's file
    c = native.ply_read(p_py)
    np.testing.assert_allclose(c["means3D"], means, atol=1e-6)


def test_file_loader_prefetch(lib_ok, tmp_path):
    files = []
    for i in range(8):
        fp = str(tmp_path / f"f{i}.bin")
        with open(fp, "wb") as f:
            f.write(bytes([i]) * (4000 + i))
        files.append(fp)
    ld = native.FileLoader(n_threads=3, cache_limit_bytes=1 << 20)
    ld.prefetch(files)
    for i, fp in enumerate(files):
        assert ld.take(fp) == bytes([i]) * (4000 + i)
    # take() also works without prefetch (blocking read)
    with open(str(tmp_path / "x.bin"), "wb") as f:
        f.write(b"hello")
    assert ld.take(str(tmp_path / "x.bin")) == b"hello"
    ld.close()


def test_dataset_reader_uses_loader(lib_ok, tmp_path):
    """load_timestep round-trips through the native loader byte path."""
    import json

    from PIL import Image

    from dynamic3dgaussians_tpu.data import dataset as D

    root, seq = str(tmp_path), "seq"
    os.makedirs(os.path.join(root, seq, "ims", "0"))
    os.makedirs(os.path.join(root, seq, "seg", "0"))
    rng = np.random.RandomState(0)
    im = (rng.rand(16, 24, 3) * 255).astype(np.uint8)
    Image.fromarray(im).save(os.path.join(root, seq, "ims", "0", "000000.jpg"))
    Image.fromarray((rng.rand(16, 24) > 0.5).astype(np.uint8) * 255).save(
        os.path.join(root, seq, "seg", "0", "000000.png"))
    md = {"fn": [["0/000000.jpg"]], "hw": [[16, 24]],
          "k": [[[[20, 0, 12], [0, 20, 8], [0, 0, 1]]]],
          "w2c": [[np.eye(4).tolist()]]}
    with open(os.path.join(root, seq, "train_meta.json"), "w") as f:
        json.dump(md, f)

    plain = D.load_timestep(root, seq, md, 0)
    ld = native.FileLoader(n_threads=2)
    ld.prefetch(D.timestep_paths(root, seq, md, 0))
    via_loader = D.load_timestep(root, seq, md, 0, loader=ld)
    np.testing.assert_allclose(np.asarray(via_loader[0]["im"]),
                               np.asarray(plain[0]["im"]))
    np.testing.assert_allclose(np.asarray(via_loader[0]["seg"]),
                               np.asarray(plain[0]["seg"]))
    ld.close()
