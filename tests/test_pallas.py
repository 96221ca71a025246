"""Pallas kernel path vs XLA tiled path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
from tests.scenes import lookat_camera, random_scene

CFG = RasterConfig(tile_h=16, tile_w=16, chunk=64, max_per_tile=256,
                   max_tiles_per_gaussian=64, pairs_per_gaussian=32)


def _args(n=150, seed=0, w=64, h=48):
    cam, _, _ = lookat_camera(w=w, h=h, f=50.0, dist=4.0)
    means, colors, opac, scales, quats = random_scene(n, seed=seed)
    return (cam, jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opac),
            jnp.asarray(scales), jnp.asarray(quats))


def test_pallas_matches_tiled():
    args = _args()
    bg = jnp.asarray([0.2, 0.1, 0.4])
    t = render(*args, config=CFG, bg=bg)
    p = render(*args, config=CFG, bg=bg, method="pallas")
    np.testing.assert_allclose(np.asarray(p.rgb), np.asarray(t.rgb),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(p.depth), np.asarray(t.depth),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p.alpha), np.asarray(t.alpha),
                               atol=2e-4)


def test_pallas_extra_channels():
    args = _args(n=100, seed=2)
    seg = jnp.asarray(np.random.RandomState(0).rand(100, 3), jnp.float32)
    t = render(*args, extra_channels=seg, config=CFG)
    p = render(*args, extra_channels=seg, config=CFG, method="pallas")
    np.testing.assert_allclose(np.asarray(p.extra), np.asarray(t.extra),
                               atol=2e-4)


def test_pallas_custom_vjp_grads_match():
    args = _args(n=80, seed=3, w=32, h=32)

    def loss(method):
        def f(m, c, o, s, q):
            out = render(args[0], m, c, o, s, q, method=method, config=CFG)
            return (jnp.mean((out.rgb - 0.3) ** 2)
                    + 0.05 * jnp.mean(out.depth) + 0.01 * jnp.mean(out.alpha))
        return f

    g_t = jax.grad(loss("tiled"), argnums=(0, 1, 2, 3, 4))(*args[1:])
    g_p = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3, 4))(*args[1:])
    for a, b in zip(g_t, g_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-3)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in g_p)


def test_pallas_early_termination_consistent():
    """Opaque wall of gaussians: early exit must not change the image."""
    cam, _, _ = lookat_camera(w=32, h=32, f=40.0, dist=4.0)
    n = 600
    rng = np.random.RandomState(4)
    means = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    means[:, 2] = np.linspace(-0.5, 0.5, n)  # stacked in depth
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = np.full((n,), 0.95, np.float32)
    scales = np.full((n, 3), 0.3, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    args = (cam, jnp.asarray(means), jnp.asarray(colors), jnp.asarray(opac),
            jnp.asarray(scales), jnp.asarray(quats))
    cfg = RasterConfig(tile_h=16, tile_w=16, chunk=64, max_per_tile=1024,
                       max_tiles_per_gaussian=64, pairs_per_gaussian=64)
    t = render(*args, config=cfg)
    p = render(*args, config=cfg, method="pallas")
    # T dies after a handful of gaussians; kernel stops, XLA doesn't — the
    # residual contributions are bounded by the 1e-4 termination threshold
    np.testing.assert_allclose(np.asarray(p.rgb), np.asarray(t.rgb),
                               atol=5e-4)
    assert float(t.alpha[16, 16]) > 0.99  # center pixel saturated

def test_pallas_grads_match_finite_differences():
    """Direct FD check of the custom_vjp against central differences."""
    args = _args(n=12, seed=5, w=32, h=16)
    cam = args[0]
    means, colors, opac, scales, quats = [np.asarray(a) for a in args[1:]]

    def loss_np(m):
        out = render(cam, jnp.asarray(m), jnp.asarray(colors),
                     jnp.asarray(opac), jnp.asarray(scales),
                     jnp.asarray(quats), method="pallas", config=CFG)
        return float(jnp.sum(out.rgb * 0.7) + 0.2 * jnp.sum(out.alpha))

    g = jax.grad(lambda m: jnp.sum(render(
        cam, m, jnp.asarray(colors), jnp.asarray(opac), jnp.asarray(scales),
        jnp.asarray(quats), method="pallas", config=CFG).rgb * 0.7)
        + 0.2 * jnp.sum(render(
            cam, m, jnp.asarray(colors), jnp.asarray(opac),
            jnp.asarray(scales), jnp.asarray(quats), method="pallas",
            config=CFG).alpha))(jnp.asarray(means))
    g = np.asarray(g)

    rng = np.random.RandomState(0)

    def fd_at(i, j, eps):
        mp, mm = means.copy(), means.copy()
        mp[i, j] += eps
        mm[i, j] -= eps
        return (loss_np(mp) - loss_np(mm)) / (2 * eps)

    # The renderer is only PIECEWISE smooth (alpha clamp/eps-gate, EWA
    # view-limit clips): at coordinates sitting on a kink, central FD
    # measures the two-sided average slope while autodiff gives the exact
    # one-sided derivative — and all three implementations (oracle, tiled,
    # pallas) agree bitwise there. So require a solid MAJORITY of sampled
    # coordinates to match FD instead of all of them.
    checked, matched = 0, 0
    for _ in range(12):
        i, j = rng.randint(0, means.shape[0]), rng.randint(0, 3)
        if abs(g[i, j]) < 1e-4:
            continue  # FD too noisy near zero
        fd1 = fd_at(i, j, 3e-3)
        fd2 = fd_at(i, j, 1.5e-3)
        if abs(fd1 - fd2) > 0.05 * max(abs(fd1), abs(fd2), 1e-3):
            continue  # FD itself unstable across eps: kink inside interval
        checked += 1
        if abs(g[i, j] - fd2) <= 0.08 * abs(fd2) + 5e-4:
            matched += 1
    assert checked >= 3 and matched >= 0.7 * checked, (checked, matched)


def test_pallas_32_channel_feature_field():
    """The reference rasterizes 32 semantic channels as a core capability
    (cuda_rasterizer/config.h:16, dyn_train.py:244); CV = 3+32+2 rides the
    same compositing pass. Forward parity vs tiled + gradient flow to the
    feature table (VERDICT r1 item 7)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
    from tests.scenes import lookat_camera, random_scene

    cam, _, _ = lookat_camera(w=64, h=48, f=45.0, dist=4.0)
    means, colors, opac, scales, quats = random_scene(600, seed=21)
    feat = np.random.RandomState(3).uniform(
        0, 1, (600, 32)).astype(np.float32)
    args = tuple(map(jnp.asarray, (means, colors, opac, scales, quats)))
    cfg = RasterConfig(tile_h=16, tile_w=16, chunk=128,
                       max_tiles_per_gaussian=16, max_per_tile=1024,
                       pairs_per_gaussian=16)

    pal = render(*((cam,) + args), extra_channels=jnp.asarray(feat),
                 config=cfg, method="pallas")
    til = render(*((cam,) + args), extra_channels=jnp.asarray(feat),
                 config=cfg, method="tiled")
    assert pal.extra.shape == (48, 64, 32)
    np.testing.assert_allclose(np.asarray(pal.rgb), np.asarray(til.rgb),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(pal.extra), np.asarray(til.extra),
                               atol=3e-5)

    ct = jnp.asarray(np.random.RandomState(4).normal(
        size=(48, 64, 32)).astype(np.float32))

    def loss(f, method):
        out = render(*((cam,) + args), extra_channels=f, config=cfg,
                     method=method)
        return jnp.sum(out.extra * ct)

    gp = jax.grad(lambda f: loss(f, "pallas"))(jnp.asarray(feat))
    gt_ = jax.grad(lambda f: loss(f, "tiled"))(jnp.asarray(feat))
    err = np.abs(np.asarray(gp) - np.asarray(gt_)) / \
        np.maximum(np.abs(np.asarray(gt_)), 1.0)
    assert err.max() < 1e-3, err.max()


def test_pack_records_parity():
    """f16-packed sort payload (pack_records=True) must match the f32
    transport under the 8-bit image quantum, forward and gradients alike
    (sorted_raster.pack2_f16: tile-relative x/y + packed conic/op/chan)."""
    import dataclasses as dc
    args = _args(n=120, seed=5)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    c0 = CFG
    c1 = dc.replace(CFG, pack_records=True)
    o0 = render(*args, config=c0, bg=bg, method="pallas")
    o1 = render(*args, config=c1, bg=bg, method="pallas")
    np.testing.assert_allclose(np.asarray(o1.rgb), np.asarray(o0.rgb),
                               atol=3.9e-3)  # one 8-bit quantum
    np.testing.assert_allclose(np.asarray(o1.alpha), np.asarray(o0.alpha),
                               atol=3.9e-3)

    def loss(cfg):
        def f(m, c, o, s, q):
            out = render(args[0], m, c, o, s, q, method="pallas",
                         config=cfg, bg=bg)
            return jnp.mean((out.rgb - 0.3) ** 2) + 0.01 * jnp.mean(
                out.alpha)
        return f

    g0 = jax.grad(loss(c0), argnums=(0, 1, 2, 3, 4))(*args[1:])
    g1 = jax.grad(loss(c1), argnums=(0, 1, 2, 3, 4))(*args[1:])
    for a, b in zip(g0, g1):
        na = float(np.linalg.norm(np.asarray(a).ravel()))
        rel = float(np.linalg.norm((np.asarray(b) - np.asarray(a)).ravel()))
        assert rel <= max(5e-3 * na, 1e-6), (rel, na)


def test_bwd_mxu_power_moments_grads_match():
    """Backward kernel power_impl="mxu": the bilinear-form power recompute
    + the moment-matmul gradient reductions (raster_bwd._power_moments)
    must match the VPU backward to MXU-split precision (~1e-5 rel)."""
    import dataclasses as dc
    args = _args(n=150, seed=7)

    def loss(cfg):
        def f(m, c, o, s, q):
            out = render(args[0], m, c, o, s, q, method="pallas",
                         config=cfg)
            return (jnp.mean((out.rgb - 0.3) ** 2)
                    + 0.02 * jnp.mean(out.depth)
                    + 0.01 * jnp.mean(out.alpha))
        return f

    g0 = jax.grad(loss(dc.replace(CFG, power_impl="vpu")),
                  argnums=(0, 1, 2, 3, 4))(*args[1:])
    g1 = jax.grad(loss(dc.replace(CFG, power_impl="mxu")),
                  argnums=(0, 1, 2, 3, 4))(*args[1:])
    for a, b in zip(g0, g1):
        na = float(np.linalg.norm(np.asarray(a).ravel()))
        rel = float(np.linalg.norm((np.asarray(b) - np.asarray(a)).ravel()))
        assert rel <= max(1e-3 * na, 1e-7), (rel, na)


def test_bench_fast_candidate_parity():
    """bench.py's "fast" forward candidate — the full round-3 lever stack
    (exact_cull + power_impl="mxu" + chunk=256 block-128 scan +
    pack_records) — must match the proven base config under the 8-bit
    image quantum, so the bench headline can switch configs without
    changing what is being measured."""
    import dataclasses as dc
    args = _args(n=150, seed=11)
    bg = jnp.asarray([0.15, 0.1, 0.2])
    base = dc.replace(CFG, max_tiles_per_gaussian=8)
    fast = dc.replace(base, power_impl="mxu", chunk=256,
                      scan_impl="matmul_block128", pack_records=True)
    o0 = render(*args, config=base, bg=bg, method="pallas")
    o1 = render(*args, config=fast, bg=bg, method="pallas")
    np.testing.assert_allclose(np.asarray(o1.rgb), np.asarray(o0.rgb),
                               atol=3.9e-3)  # one 8-bit quantum
    # alpha rides the packed bf16 opacity row; a hair over one quantum
    np.testing.assert_allclose(np.asarray(o1.alpha), np.asarray(o0.alpha),
                               atol=5e-3)
    assert int(o1.n_dropped_rect) == 0

    def loss(cfg):
        def f(m, c, o, s, q):
            out = render(args[0], m, c, o, s, q, method="pallas",
                         config=cfg, bg=bg)
            return jnp.mean((out.rgb - 0.3) ** 2) + 0.01 * jnp.mean(
                out.alpha)
        return f

    g0 = jax.grad(loss(base), argnums=(0, 1, 2, 3, 4))(*args[1:])
    g1 = jax.grad(loss(fast), argnums=(0, 1, 2, 3, 4))(*args[1:])
    for a, b in zip(g0, g1):
        na = float(np.linalg.norm(np.asarray(a).ravel()))
        rel = float(np.linalg.norm((np.asarray(b) - np.asarray(a)).ravel()))
        assert rel <= max(1e-2 * na, 3e-5), (rel, na)


def test_fused_op_candidate_parity():
    """power_impl="mxu_fused" (precomputed log2-opacity rows + fused
    alpha*T exp2, raster_fwd.chunk_logalpha_fused) must match the mxu
    config to ~f32 rounding on the image — the ONLY added error is one
    log2(op) rounding — and its grads (backward runs the proven mxu path)
    to the same tolerance class as mxu-vs-vpu."""
    import dataclasses as dc
    args = _args(n=150, seed=11)
    bg = jnp.asarray([0.15, 0.1, 0.2])
    mxu = dc.replace(CFG, max_tiles_per_gaussian=8, power_impl="mxu",
                     chunk=256, scan_impl="matmul_block128",
                     pack_records=True)
    fused = dc.replace(mxu, power_impl="mxu_fused")
    o0 = render(*args, config=mxu, bg=bg, method="pallas")
    o1 = render(*args, config=fused, bg=bg, method="pallas")
    np.testing.assert_allclose(np.asarray(o1.rgb), np.asarray(o0.rgb),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(o1.alpha), np.asarray(o0.alpha),
                               atol=2e-6)
    assert int(o1.n_dropped_rect) == 0

    def loss(cfg):
        def f(m, c, o, s, q):
            out = render(args[0], m, c, o, s, q, method="pallas",
                         config=cfg, bg=bg)
            return jnp.mean((out.rgb - 0.3) ** 2) + 0.01 * jnp.mean(
                out.alpha)
        return f

    g0 = jax.grad(loss(mxu), argnums=(0, 1, 2, 3, 4))(*args[1:])
    g1 = jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4))(*args[1:])
    for a, b in zip(g0, g1):
        na = float(np.linalg.norm(np.asarray(a).ravel()))
        rel = float(np.linalg.norm((np.asarray(b) - np.asarray(a)).ravel()))
        assert rel <= max(1e-3 * na, 3e-5), (rel, na)


def test_gather_unsort_grads_bitwise_equal():
    """unsort_impl="gather" (2-row argsort + packed-row gathers,
    sorted_raster.py) must produce BITWISE-identical gradients to the
    payload-sort unsort — the permutation applied is the same, only the
    transport differs."""
    import dataclasses as dc
    args = _args(n=140, seed=13)
    bg = jnp.asarray([0.1, 0.15, 0.05])
    c_sort = dc.replace(CFG, pack_records=True, unsort_impl="sort")
    c_gather = dc.replace(CFG, pack_records=True, unsort_impl="gather")

    def loss(cfg):
        def f(m, c, o, s, q):
            out = render(args[0], m, c, o, s, q, method="pallas",
                         config=cfg, bg=bg)
            return (jnp.mean((out.rgb - 0.4) ** 2)
                    + 0.02 * jnp.mean(out.depth)
                    + 0.01 * jnp.mean(out.alpha))
        return f

    g0 = jax.grad(loss(c_sort), argnums=(0, 1, 2, 3, 4))(*args[1:])
    g1 = jax.grad(loss(c_gather), argnums=(0, 1, 2, 3, 4))(*args[1:])
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(np.abs(np.asarray(g)).max() > 0 for g in g1)
