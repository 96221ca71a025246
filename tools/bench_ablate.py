"""Ablation benchmark: attribute frame time by removing pipeline stages.

The axon relay makes isolated micro-benchmarks unstable (25x variance run
to run), but full-pipeline pipelined numbers reproduce within ~3%. So:
time the bench frame with stages cut off at different points; differences
between STABLE numbers attribute the cost.

  proj_emit   projection + emission + broadcasts only
  sorted      + fused-key payload sort + pack (no kernel)
  kernel      + pallas forward kernel (no untile/bg)
  full        + untile + bg composite  (== bench.py)

Usage: python tools/bench_ablate.py
"""

from __future__ import annotations

import time

import numpy as np


from dynamic3dgaussians_tpu.utils.timing import pipelined_ms


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    enable()
    from dynamic3dgaussians_tpu.ops.binning import emit_pairs
    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.ops.pallas.raster_fwd import (
        GEOM_ROWS, pallas_composite_tiles)
    from dynamic3dgaussians_tpu.ops.projection import project
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
    from dynamic3dgaussians_tpu.ops.sorted_raster import (
        depth_key_bits, dequantize_depth_key, fuse_tile_depth_key)

    n, h, w = 200_000, 360, 640
    k_cap, chunk, th, tw = 4, 128, 16, 16
    grid_h, grid_w = h // th, w // tw
    num_tiles = grid_h * grid_w
    bits_z = depth_key_bits(num_tiles)
    rng = np.random.RandomState(0)
    means = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.5, 0.99, (n,)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(.004, .015, (n, 3)).astype(np.float32))
    q = rng.normal(size=(n, 4)).astype(np.float32)
    quats = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 6.0
    cam = make_camera(w, h, [[500, 0, w / 2], [0, 500, h / 2], [0, 0, 1]],
                      w2c)
    cfg = RasterConfig(tile_h=th, tile_w=tw, chunk=chunk,
                       max_tiles_per_gaussian=k_cap)

    def upto_pack(s, do_sort=True):
        proj = project(means + s, scales, quats, cam)
        op = jnp.where(proj.valid, opac, 0.0)
        tile_key, _, _ = emit_pairs(proj, th, tw, grid_h, grid_w, k_cap)

        def bcast(v):
            return jnp.broadcast_to(v[None, :], (k_cap, n)).reshape(-1)
        log2e = jnp.float32(1.4426950408889634)   # base-2 kernels
        geom = (bcast(proj.x2d), bcast(proj.y2d),
                bcast(proj.conic_a * log2e), bcast(proj.conic_b * log2e),
                bcast(proj.conic_c * log2e), bcast(op))
        chan = tuple(bcast(colors.T[c]) for c in range(3))
        depth = bcast(proj.depth)
        pos = lax.broadcasted_iota(jnp.int32, (1, k_cap * n), 1)[0]
        if not do_sort:
            return geom, chan, depth, tile_key, pos, None, None
        key = fuse_tile_depth_key(tile_key, depth, bits_z)
        srt = lax.sort((key, pos) + geom + chan, num_keys=1,
                       is_stable=False)
        sk = srt[0]
        sd = dequantize_depth_key(sk, bits_z)
        bounds = jnp.searchsorted(
            sk, (jnp.arange(num_tiles + 1, dtype=jnp.int32) << bits_z),
            side="left").astype(jnp.int32)
        starts, counts = bounds[:-1], bounds[1:] - bounds[:-1]
        ne = sk.shape[0]
        ne_pad = (-(-ne // chunk) + 1) * chunk
        pad = ne_pad - ne
        rows = list(srt[2:8]) + [jnp.zeros_like(sd)] * (GEOM_ROWS - 6)
        rows += list(srt[8:]) + [sd, jnp.ones_like(sd)] + \
            [jnp.zeros_like(sd)] * 3
        rec_t = jnp.pad(jnp.stack(rows, 0), ((0, 0), (0, pad)))
        return rec_t, starts, counts

    @jax.jit
    def f_proj(s):
        geom, chan, depth, tile_key, pos, _, _ = upto_pack(s, do_sort=False)
        return (sum(jnp.sum(g) for g in geom) + sum(jnp.sum(c) for c in chan)
                + jnp.sum(depth) + jnp.sum(tile_key))

    @jax.jit
    def f_sorted(s):
        rec_t, starts, counts = upto_pack(s)
        return jnp.sum(rec_t) + jnp.sum(counts)

    def make_f_kernel(impl):
        @jax.jit
        def f_kernel(s):
            rec_t, starts, counts = upto_pack(s)
            raw, log_t, n_act = pallas_composite_tiles(
                rec_t, starts, counts, num_tiles=num_tiles,
                grid_w=grid_w, tile_h=th, tile_w=tw, chunk=chunk,
                scan_impl=impl)
            return jnp.sum(raw), jnp.sum(n_act), jnp.max(n_act)
        return f_kernel

    @jax.jit
    def f_full(s):
        return render(cam, means + s, colors, opac, scales, quats,
                      config=cfg, method="pallas").rgb

    runs = [("proj_emit", f_proj), ("sorted", f_sorted)]
    runs += [(f"kernel[{im}]", make_f_kernel(im))
             for im in ("matmul_split3", "matmul_highest", "roll_scan")]
    runs += [("full", f_full)]
    for name, f in runs:
        ms = pipelined_ms(f)
        extra = ""
        if name.startswith("kernel"):
            _, tot, mx = f(np.float32(0.0))
            extra = (f"  (chunks: total={int(tot)}, max/tile={int(mx)}, "
                     f"tiles={num_tiles})")
        print(f"{name}: {ms:.3f} ms{extra}", flush=True)


if __name__ == "__main__":
    main()
