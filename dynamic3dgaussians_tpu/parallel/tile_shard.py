"""Pixel/tile-sharded rendering: stripe the tile grid across the mesh.

Stage B of the scaling plan (SURVEY.md §7 step 9): ONE render spread over
devices by tile-row stripes. Each device runs projection + pair
emission + the (tile, depth) sort on its replica (cheap relative to
compositing for pixel-heavy frames), then executes the Pallas tile kernel
ONLY over its stripe of the tile grid — per-tile segment starts/counts are
just sliced, the sorted pair buffer is read (not copied) per stripe, so
kernel time scales ~1/K. The composited stripes concatenate along the image
Y axis with one all_gather.

This is the inference/serving scaler (a single camera too big for one
chip); training throughput scales with parallel.camera_dp (independent
cameras per device + gradient psum), and gaussian-count scaling with
parallel.gaussian_shard.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dynamic3dgaussians_tpu.ops.binning import emit_pairs
from dynamic3dgaussians_tpu.ops.camera import Camera
from dynamic3dgaussians_tpu.ops.projection import project
from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig
from dynamic3dgaussians_tpu.ops.sorted_raster import _untile


def make_tile_sharded_render(cam: Camera, mesh: Mesh, axis: str = "x",
                             config: Optional[RasterConfig] = None):
    """Build a jitted tile-sharded forward renderer over mesh[axis].

    Returns fn(means3d, colors, opacity, scales, rotations, bg) ->
    dict(rgb, depth, alpha) with the full image replicated. grid_h must be
    divisible by the axis size (pad the camera height to a tile multiple).
    """
    cfg = config or RasterConfig()
    k_dev = mesh.shape[axis]
    h, w = cam.height, cam.width
    th, tw, chunk = cfg.tile_h, cfg.tile_w, cfg.chunk
    grid_h, grid_w = -(-h // th), -(-w // tw)
    assert grid_h % k_dev == 0, (
        f"tile rows {grid_h} must divide by mesh axis {k_dev}")
    rows_local = grid_h // k_dev
    tiles_local = rows_local * grid_w
    num_tiles = grid_h * grid_w

    def local_render(means, colors, opacity, scales, rotations, bg):
        d = jax.lax.axis_index(axis)
        n = opacity.shape[0]
        n_chan = colors.shape[-1]
        proj = project(means, scales, rotations, cam)
        op = jnp.where(proj.valid, opacity, 0.0)
        tile_key, _, _ = emit_pairs(proj, th, tw, grid_h, grid_w,
                                    cfg.max_tiles_per_gaussian)

        def bcast(v):
            return jnp.broadcast_to(
                v[None, :], (cfg.max_tiles_per_gaussian, n)).reshape(-1)

        colors_t = colors.T
        # the kernel derives pixel coords from its LOCAL tile index, so the
        # gaussian y coordinate must be expressed in stripe-local pixels and
        # tile keys in stripe-local ids (off-stripe pairs -> sentinel); the
        # custom_vjp composite (sort -> kernel -> reverse kernel -> unsort)
        # then makes the stripe fully differentiable.
        y_local = proj.y2d - (d * rows_local * th).astype(jnp.float32)
        t0 = d * tiles_local
        key_local = jnp.where(
            (tile_key >= t0) & (tile_key < t0 + tiles_local),
            tile_key - t0, tiles_local)
        log2e = jnp.float32(1.4426950408889634)  # base-2 kernels
        geom = (bcast(proj.x2d), bcast(y_local),
                bcast(proj.conic_a * log2e), bcast(proj.conic_b * log2e),
                bcast(proj.conic_c * log2e), bcast(op))
        chan = tuple(bcast(colors_t[c]) for c in range(n_chan))
        depth_b = bcast(proj.depth)
        pos = jax.lax.broadcasted_iota(
            jnp.int32, (1, cfg.max_tiles_per_gaussian * n), 1)[0]
        from dynamic3dgaussians_tpu.ops.sorted_raster import (
            _make_composite, depth_key_bits)
        bits_z = depth_key_bits(tiles_local) if cfg.fused_key else 0
        composite = _make_composite(
            tiles_local, grid_w, th, tw, chunk, n_chan, bits_z,
            bits_z > 0 and cfg.depth_mode == "quantized",
            cfg.kernel_precision)
        raw = composite(key_local, depth_b, pos, geom, chan)
        alpha_t = raw[..., n_chan + 1]
        chan_t = raw[..., :n_chan] + (1.0 - alpha_t[..., None]) * bg
        stripe_h = rows_local * th
        stripe = _untile(
            jnp.concatenate([chan_t, raw[..., n_chan:n_chan + 1],
                             alpha_t[..., None]], -1),
            rows_local, grid_w, th, tw, stripe_h, w, n_chan + 2)
        full = jax.lax.all_gather(stripe, axis)      # (K, stripe_h, w, C+2)
        return full.reshape(grid_h * th, w, n_chan + 2)[:h]

    sharded = shard_map(local_render, mesh=mesh,
                        in_specs=(P(), P(), P(), P(), P(), P()),
                        out_specs=P(), check_vma=False)

    @jax.jit
    def fn(means3d, colors, opacity, scales, rotations, bg=None):
        n_chan = colors.shape[-1]
        if bg is None:
            bg = jnp.zeros((n_chan,), jnp.float32)
        out = sharded(means3d, colors, opacity.reshape(-1), scales,
                      rotations, jnp.asarray(bg, jnp.float32))
        return {"rgb": out[..., :n_chan], "depth": out[..., n_chan],
                "alpha": out[..., n_chan + 1]}

    return fn
