"""Frozen golden fixtures: CPU parity + the TPU compiled-kernel gate.

See tests/fixtures/TOLERANCES.md for the budget rationale. The TPU test is
skipped on CPU CI and runs when pytest executes with the real chip visible
(e.g. `python -m pytest tests/test_golden_fixtures.py --no-header -q` from
an environment without the conftest CPU override — the bench harness does
this via tools/run_tpu_gate.py).
"""

import glob
import os

import numpy as np
import pytest

FIXTURES = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "fixtures", "golden_render_*.npz")))


def _render_both(fx, method, cfg_overrides=None):
    import jax
    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render

    w, h, f = int(fx["w"]), int(fx["h"]), float(fx["f"])
    cam = make_camera(w, h, [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]],
                      fx["w2c"])
    cfg = RasterConfig(tile_h=16, tile_w=16, chunk=128, max_per_tile=1024,
                       max_tiles_per_gaussian=int(fx["k_cap"]),
                       pairs_per_gaussian=int(fx["k_cap"]))
    if cfg_overrides:
        cfg = cfg.replace(**cfg_overrides)
    kw = {}
    if "extra_in" in fx:
        kw["extra_channels"] = jnp.asarray(fx["extra_in"])
    args = (jnp.asarray(fx["means"]), jnp.asarray(fx["colors"]),
            jnp.asarray(fx["opac"]), jnp.asarray(fx["scales"]),
            jnp.asarray(fx["quats"]))
    out = render(cam, *args, method=method, config=cfg, **kw)

    ct_rgb = jnp.asarray(fx["ct_rgb"])
    ct_depth = jnp.asarray(fx["ct_depth"])

    def g(m, c, o, s, q):
        o_ = render(cam, m, c, o, s, q, method=method, config=cfg, **kw)
        tot = jnp.sum(o_.rgb * ct_rgb) + jnp.sum(o_.depth * ct_depth)
        if o_.extra is not None:
            tot = tot + jnp.sum(o_.extra * 0.1)
        return tot
    grads = jax.grad(g, argnums=(0, 1, 2, 3, 4))(*args)
    return out, grads


def _check(fx, out, grads, atol_rgb, atol_depth, rel_grad):
    np.testing.assert_allclose(np.asarray(out.rgb), fx["rgb"],
                               atol=atol_rgb)
    np.testing.assert_allclose(np.asarray(out.alpha), fx["alpha"],
                               atol=atol_rgb)
    np.testing.assert_allclose(np.asarray(out.depth), fx["depth"],
                               atol=atol_depth)
    np.testing.assert_array_equal(np.asarray(out.radii), fx["radii"])
    if "extra" in fx:
        np.testing.assert_allclose(np.asarray(out.extra), fx["extra"],
                                   atol=atol_rgb * 3)
    for got, key in zip(grads, ("d_means", "d_colors", "d_opac", "d_scales",
                                "d_quats")):
        err = np.abs(np.asarray(got) - fx[key]) / \
            np.maximum(np.abs(fx[key]), 1.0)
        assert err.max() < rel_grad, (key, err.max())


@pytest.mark.parametrize("path", FIXTURES, ids=os.path.basename)
@pytest.mark.parametrize("method", ["tiled", "pallas"])
def test_matches_frozen_fixture_cpu(path, method):
    fx = dict(np.load(path))
    out, grads = _render_both(fx, method)
    _check(fx, out, grads, atol_rgb=3e-5, atol_depth=3e-4, rel_grad=1e-2)


@pytest.mark.parametrize("path", FIXTURES, ids=os.path.basename)
def test_compiled_pallas_matches_fixture_tpu(path):
    """The compiled-kernel gate: Mosaic-compiled kernels vs frozen bits.

    Interpret-mode CI cannot see Mosaic regressions (VERDICT r1 weak #4);
    this test only runs where a TPU is the default backend.
    """
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU (compiled Mosaic kernels)")
    fx = dict(np.load(path))
    out, grads = _render_both(fx, "pallas")
    _check(fx, out, grads, atol_rgb=5e-4, atol_depth=5e-3, rel_grad=3e-2)
