"""Freeze golden render/gradient fixtures from the implementation consensus.

VERDICT r1 item 6: parity previously rested on three mutually-checked
in-repo implementations that could drift together. This tool freezes
input/output/gradient npz fixtures (computed by the tiled XLA path at
HIGHEST precision on CPU, cross-checked against the independent NumPy
golden renderer AND the interpret-mode Pallas kernels before writing), so
future regressions — including Mosaic-compiled kernel regressions on TPU —
are caught against bits that cannot drift.

Run on CPU:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
             python tools/make_golden_fixtures.py
Consumed by: tests/test_golden_fixtures.py (CPU + TPU-only compiled gate).
"""

from __future__ import annotations

import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def scene_trained_like(n=600, seed=0):
    """Small opaque gaussians, the trained-scene statistics bench uses."""
    rng = np.random.RandomState(seed)
    return dict(
        means=rng.uniform(-2, 2, (n, 3)).astype(np.float32),
        colors=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        opac=rng.uniform(0.5, 0.99, (n,)).astype(np.float32),
        scales=rng.uniform(0.02, 0.08, (n, 3)).astype(np.float32),
        quats=_unit_quats(rng, n), w=128, h=96, f=90.0, z=6.0,
        k_cap=16, extra=0)


def scene_big_splats(n=120, seed=1):
    """Large anisotropic splats spanning many tiles (stress K + clamping)."""
    rng = np.random.RandomState(seed)
    scales = np.stack([rng.uniform(0.02, 0.6, n), rng.uniform(0.02, 0.1, n),
                       rng.uniform(0.02, 0.3, n)], -1).astype(np.float32)
    return dict(
        means=rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32),
        colors=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        opac=rng.uniform(0.2, 0.9, (n,)).astype(np.float32),
        scales=scales, quats=_unit_quats(rng, n), w=128, h=96, f=90.0,
        z=4.0, k_cap=64, extra=0)


def scene_feature_field(n=400, seed=2):
    """Extra semantic channels through the same compositing pass."""
    rng = np.random.RandomState(seed)
    return dict(
        means=rng.uniform(-2, 2, (n, 3)).astype(np.float32),
        colors=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        opac=rng.uniform(0.4, 0.95, (n,)).astype(np.float32),
        scales=rng.uniform(0.02, 0.1, (n, 3)).astype(np.float32),
        quats=_unit_quats(rng, n), w=96, h=64, f=70.0, z=5.0,
        k_cap=16, extra=8)


def _unit_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


SCENES = {
    "trained_like": scene_trained_like,
    "big_splats": scene_big_splats,
    "feature_field": scene_feature_field,
}


def build_fixture(name: str, spec: dict) -> dict:
    import jax
    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render

    w, h, f, z = spec["w"], spec["h"], spec["f"], spec["z"]
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = z
    cam = make_camera(w, h, [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], w2c)
    cfg = RasterConfig(tile_h=16, tile_w=16, chunk=128, max_per_tile=1024,
                       max_tiles_per_gaussian=spec["k_cap"],
                       pairs_per_gaussian=spec["k_cap"])
    rng = np.random.RandomState(123)
    extra = (rng.uniform(0, 1, (spec["means"].shape[0], spec["extra"]))
             .astype(np.float32) if spec["extra"] else None)
    args = dict(means3d=jnp.asarray(spec["means"]),
                colors=jnp.asarray(spec["colors"]),
                opacity=jnp.asarray(spec["opac"]),
                scales=jnp.asarray(spec["scales"]),
                rotations=jnp.asarray(spec["quats"]))
    kw = dict(config=cfg)
    if extra is not None:
        kw["extra_channels"] = jnp.asarray(extra)

    def run(method):
        out = render(cam, **args, method=method, **kw)
        assert int(out.n_dropped_rect) == 0, (name, method, "rect drops")
        assert int(out.n_dropped_capacity) == 0
        return out

    tiled = run("tiled")
    pallas = run("pallas")    # interpret mode on CPU
    ref = run("reference")

    # fixed random cotangents make the gradient fixture sensitive to every
    # output channel, not just the mean
    ct_rgb = rng.normal(size=np.asarray(tiled.rgb).shape).astype(np.float32)
    ct_depth = rng.normal(size=np.asarray(tiled.depth).shape) \
        .astype(np.float32)

    def loss(method):
        def g(m, c, o, s, q):
            out = render(cam, m, c, o, s, q, method=method, **kw)
            tot = jnp.sum(out.rgb * ct_rgb) + jnp.sum(out.depth * ct_depth)
            if out.extra is not None:
                tot = tot + jnp.sum(out.extra * 0.1)
            return tot
        return jax.grad(g, argnums=(0, 1, 2, 3, 4))(
            args["means3d"], args["colors"], args["opacity"],
            args["scales"], args["rotations"])

    g_tiled = loss("tiled")
    g_pallas = loss("pallas")

    # consensus gates before freezing (drift guard)
    np.testing.assert_allclose(np.asarray(tiled.rgb), np.asarray(ref.rgb),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pallas.rgb), np.asarray(tiled.rgb),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pallas.depth),
                               np.asarray(tiled.depth), atol=2e-4)
    for gt, gp in zip(g_tiled, g_pallas):
        d = np.abs(np.asarray(gt) - np.asarray(gp))
        s = np.maximum(np.abs(np.asarray(gt)), 1.0)
        assert (d / s).max() < 5e-3, (name, "grad consensus", (d / s).max())

    fx = dict(
        # inputs
        means=spec["means"], colors=spec["colors"], opac=spec["opac"],
        scales=spec["scales"], quats=spec["quats"], w2c=w2c,
        w=np.int32(w), h=np.int32(h), f=np.float32(f),
        k_cap=np.int32(spec["k_cap"]),
        ct_rgb=ct_rgb, ct_depth=ct_depth,
        # outputs (tiled XLA at HIGHEST precision = the frozen consensus)
        rgb=np.asarray(tiled.rgb), depth=np.asarray(tiled.depth),
        alpha=np.asarray(tiled.alpha), radii=np.asarray(tiled.radii),
        # gradients
        d_means=np.asarray(g_tiled[0]), d_colors=np.asarray(g_tiled[1]),
        d_opac=np.asarray(g_tiled[2]), d_scales=np.asarray(g_tiled[3]),
        d_quats=np.asarray(g_tiled[4]),
    )
    if extra is not None:
        fx["extra_in"] = extra
        fx["extra"] = np.asarray(tiled.extra)
    return fx


def main():
    import jax
    if jax.default_backend() != "cpu":
        raise SystemExit("generate fixtures on CPU (JAX_PLATFORMS=cpu) so "
                         "the frozen bits come from the f32 HIGHEST path")
    jax.config.update("jax_default_matmul_precision", "highest")
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for name, fn in SCENES.items():
        fx = build_fixture(name, fn())
        path = os.path.join(FIXTURE_DIR, f"golden_render_{name}.npz")
        np.savez_compressed(path, **fx)
        print(f"wrote {path} ({os.path.getsize(path) // 1024} KiB)")


if __name__ == "__main__":
    main()
