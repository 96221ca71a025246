"""Stage-by-stage TPU timing of one render frame + backward at bench config.

Answers VERDICT round-1 item 1: where do the ~10.6 ms of a 200k-gaussian
360x640 frame go (projection / emission / sort / tile ranges / forward
kernel / untile; backward kernel / unsort / reduce)?

Each stage is jitted separately over the previous stage's concrete outputs,
so the numbers include each stage's own HBM round trips (the fused
end-to-end render is faster than the sum; use these for *relative* cost).
Every timed call perturbs one input so no caching layer (jit or the axon
relay) can replay a previous result.

Usage: python tools/profile_render.py [--n 200000] [--iters 20]
Writes a markdown table to stdout; redirect into PROFILE.md.
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def timeit(fn, *args, iters=20, perturb=None):
    """Median ms of fn(*args) with a scalar perturbation argument."""
    import jax
    out = fn(np.float32(0.0), *args)
    jax.block_until_ready(out)
    ts = []
    for i in range(iters):
        s = np.float32(1e-7 * (i + 1))
        t0 = time.perf_counter()
        out = fn(s, *args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--h", type=int, default=360)
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--k_cap", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    enable()

    from dynamic3dgaussians_tpu.ops.binning import emit_pairs, tile_ranges
    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.ops.pallas.raster_fwd import (
        GEOM_ROWS, pallas_composite_tiles)
    from dynamic3dgaussians_tpu.ops.pallas.raster_bwd import \
        pallas_composite_tiles_bwd
    from dynamic3dgaussians_tpu.ops.projection import project
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render

    n, h, w = args.n, args.h, args.w
    k_cap, chunk = args.k_cap, args.chunk
    tile_h = tile_w = 16
    grid_h, grid_w = -(-h // tile_h), -(-w // tile_w)
    num_tiles = grid_h * grid_w
    n_chan = 3
    cv = n_chan + 2
    cv_pad = -(-cv // 8) * 8

    rng = np.random.RandomState(0)
    means = rng.uniform(-2.0, 2.0, (n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.5, 0.99, (n,)).astype(np.float32)
    scales = rng.uniform(0.004, 0.015, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 6.0
    f = 500.0
    cam = make_camera(w, h, [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], w2c)
    cfg = RasterConfig(tile_h=tile_h, tile_w=tile_w, chunk=chunk,
                       max_tiles_per_gaussian=k_cap)

    means, colors, opac, scales, quats = map(
        jnp.asarray, (means, colors, opac, scales, quats))

    rows = {}

    # ---- full forward ----
    @jax.jit
    def full_fwd(s, m):
        return render(cam, m + s, colors, opac, scales, quats,
                      config=cfg, method="pallas").rgb
    rows["full forward render"] = timeit(full_fwd, means, iters=args.iters)

    # ---- stage 1: projection ----
    @jax.jit
    def s_proj(s, m):
        p = project(m + s, scales, quats, cam)
        return (p.x2d, p.y2d, p.conic_a, p.conic_b, p.conic_c, p.depth,
                p.radius, p.valid)
    rows["projection (EWA)"] = timeit(s_proj, means, iters=args.iters)
    proj = project(means, scales, quats, cam)

    # ---- stage 2: emission + broadcasts ----
    @jax.jit
    def s_emit(s, p):
        p = p.replace(x2d=p.x2d + s)
        tile_key, _, nd = emit_pairs(p, tile_h, tile_w, grid_h, grid_w, k_cap)

        def bcast(v):
            return jnp.broadcast_to(v[None, :], (k_cap, n)).reshape(-1)
        geom = (bcast(p.x2d), bcast(p.y2d), bcast(p.conic_a),
                bcast(p.conic_b), bcast(p.conic_c), bcast(opac))
        depth = bcast(p.depth)
        ct = colors.T
        chan = tuple(bcast(ct[c]) for c in range(n_chan))
        return (tile_key, depth) + geom + chan
    rows["emission + broadcast (K=%d)" % k_cap] = timeit(
        s_emit, proj, iters=args.iters)
    emitted = s_emit(np.float32(0.0), proj)
    tile_key, depth = emitted[0], emitted[1]
    geom, chan = emitted[2:8], emitted[8:]
    pos = lax.broadcasted_iota(jnp.int32, (1, k_cap * n), 1)[0]

    # ---- stage 3: the payload sort (12 rows + pos) ----
    @jax.jit
    def s_sort(s, tk, d, g, c):
        arrays = (tk, d + s, pos) + tuple(g) + tuple(c)
        return lax.sort(arrays, num_keys=2, is_stable=False)
    rows["pair sort (2 keys + %d payload rows)" % (1 + 6 + n_chan)] = timeit(
        s_sort, tile_key, depth, geom, chan, iters=args.iters)
    srt = s_sort(np.float32(0.0), tile_key, depth, geom, chan)

    # sort with NO payload, keys only, for reference
    @jax.jit
    def s_sort_keys(s, tk, d):
        return lax.sort((tk, d + s), num_keys=2, is_stable=False)
    rows["pair sort (keys only)"] = timeit(
        s_sort_keys, tile_key, depth, iters=args.iters)

    # ---- stage 4: ranges + stack/pad into kernel layout ----
    @jax.jit
    def s_pack(s, srt):
        st, sd = srt[0], srt[1] + s
        starts, counts = tile_ranges(st, num_tiles)
        ne = st.shape[0]
        ne_pad = (-(-ne // chunk) + 1) * chunk
        pad = ne_pad - ne
        rows_ = list(srt[3:9])
        rows_ += [jnp.zeros_like(st, jnp.float32)] * (GEOM_ROWS - 6)
        geom_t = jnp.pad(jnp.stack(rows_, 0), ((0, 0), (0, pad)))
        vrows = list(srt[9:]) + [sd, jnp.ones_like(sd)]
        vrows += [jnp.zeros_like(sd)] * (cv_pad - cv)
        vals_t = jnp.pad(jnp.stack(vrows, 0), ((0, 0), (0, pad)))
        return geom_t, vals_t, starts, counts
    rows["tile ranges + pack"] = timeit(s_pack, srt, iters=args.iters)
    geom_t, vals_t, starts, counts = s_pack(np.float32(0.0), srt)

    # ---- stage 5: forward pallas kernel ----
    @jax.jit
    def s_kernel(s, g, v, st, ct):
        return pallas_composite_tiles(
            g + s, v, st, ct, num_tiles=num_tiles, grid_w=grid_w,
            tile_h=tile_h, tile_w=tile_w, chunk=chunk)
    rows["forward pallas kernel"] = timeit(
        s_kernel, geom_t, vals_t, starts, counts, iters=args.iters)
    raw, log_t, n_active = s_kernel(np.float32(0.0), geom_t, vals_t,
                                    starts, counts)

    # ---- backward ----
    d_raw = jnp.ones_like(raw)

    @jax.jit
    def s_bwd_kernel(s, g, v, st, ct, na, lt, dr):
        return pallas_composite_tiles_bwd(
            g + s, v, st, ct, na.reshape(-1), lt, dr,
            num_tiles=num_tiles, grid_w=grid_w, tile_h=tile_h,
            tile_w=tile_w, chunk=chunk)
    rows["backward pallas kernel"] = timeit(
        s_bwd_kernel, geom_t, vals_t, starts, counts, n_active, log_t,
        d_raw, iters=args.iters)
    d_out = s_bwd_kernel(np.float32(0.0), geom_t, vals_t, starts, counts,
                         n_active, log_t, d_raw)

    # ---- unsort + gaussian reduction ----
    spos = srt[2]

    @jax.jit
    def s_unsort(s, sp, do):
        ne = sp.shape[0]
        d_rows = [do[r, :ne] + s for r in range(6)]
        d_rows += [do[GEOM_ROWS + n_chan, :ne]]
        d_rows += [do[GEOM_ROWS + c, :ne] for c in range(n_chan)]
        un = lax.sort((sp,) + tuple(d_rows), num_keys=1, is_stable=False)
        return [u.reshape(k_cap, n).sum(0) for u in un[1:]]
    rows["grad unsort + K-reduce"] = timeit(
        s_unsort, spos, d_out, iters=args.iters)

    # ---- full vjp ----
    @jax.jit
    def full_bwd(s, m):
        def loss(mm, cc, oo, ss, qq):
            out = render(cam, mm, cc, oo, ss, qq, config=cfg,
                         method="pallas")
            return jnp.sum(out.rgb) + jnp.sum(out.depth)
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            m + s, colors, opac, scales, quats)
    rows["full fwd+bwd (5-way grad)"] = timeit(full_bwd, means,
                                               iters=args.iters)

    dev = jax.devices()[0]
    print(f"\n## Render profile @ n={n}, {h}x{w}, K={k_cap}, chunk={chunk},"
          f" device={dev.device_kind}\n")
    print("| stage | median ms |")
    print("|---|---|")
    for k, v in rows.items():
        print(f"| {k} | {v:.2f} |")
    tot = rows["full forward render"]
    print(f"\nfull forward = {tot:.2f} ms = {1e3 / tot:.1f} fps")


if __name__ == "__main__":
    main()
