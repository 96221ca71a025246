"""Tile binning: (gaussian, tile) pair emission + device sort + tile ranges.

TPU-native equivalent of the reference's `duplicateWithKeys` + CUB radix sort
+ `identifyTileRanges` pipeline (…/cuda_rasterizer/rasterizer_impl.cu:68-138,
281-324). The CUDA version builds a data-dependent number of 64-bit
(tile | depth-bits) keys; XLA needs static shapes, so every gaussian emits a
fixed K = `max_tiles_per_gaussian` candidate pairs (its clamped tile rect,
row-major) with a sentinel tile id for unused slots, and ONE two-key
`lax.sort((tile, depth), payload...)` puts real pairs in per-tile
front-to-back order with sentinels at the back.

Perf notes (measured on TPU v5e): `lax.sort` runs near memcpy speed and
payload arrays ride almost for free, while dynamic gathers/scatters cost
~10 cycles/element — so this module is built exclusively from sorts,
searchsorteds and elementwise math. Emission intermediates are laid out
(K, N) so the minor (lane) dimension is the large N, not the tiny K
(TPU pads the minor dim to 128 lanes; (N, K) would waste ~32x bandwidth).

Everything here is integer plumbing with zero gradients; gradients flow
through the per-pair record payloads in the sorted renderer
(ops/sorted_raster.py) or the gathered records of the XLA oracle path.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

from dynamic3dgaussians_tpu.ops.compositing import ALPHA_EPS
from dynamic3dgaussians_tpu.ops.projection import Projected, tile_rect


class TileBins(NamedTuple):
    gaussian_ids: jnp.ndarray   # (pair_capacity,) int32, sorted by (tile, z)
    tile_starts: jnp.ndarray    # (num_tiles,) int32 index into gaussian_ids
    tile_counts: jnp.ndarray    # (num_tiles,) int32 pairs per tile
    num_pairs: jnp.ndarray      # () int32 total pairs emitted (pre-drop)
    n_dropped_capacity: jnp.ndarray  # () int32 pairs dropped at pair_capacity
    n_dropped_rect: jnp.ndarray      # () int32 pairs dropped by per-gaussian cap


def emit_pairs(proj: Projected, tile_h: int, tile_w: int,
               grid_h: int, grid_w: int, max_tiles_per_gaussian: int,
               opacity: jnp.ndarray = None, enum_cap: int = 0
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Enumerate each gaussian's tile rect into flat (K*N,) pair keys.

    Returns (tile_key, gid, n_dropped_rect): tile_key holds `num_tiles` as the
    out-of-range sentinel for unused emission slots; flat index layout is
    k-major (pair slot p = k * N + gaussian), so a consumer can reshape
    per-pair data back to (K, N) and reduce over K.

    When `opacity` is given (and enum_cap > 0), candidate tiles are
    EXACT-CULLED before claiming a slot: a (gaussian, tile) pair whose
    maximum possible alpha over the tile's pixel box is below the kernel's
    own 1/255 gate can only ever contribute exact zeros (forward and
    backward alike), so dropping it is lossless. The bound uses
    Q(d) >= lam_min * |d|^2 (lam_min = smaller conic eigenvalue) with the
    box-to-center distance, i.e. it never over-culls. The CUDA reference
    emits the full rect (forward.cu:246-250) and pays the dead pairs inside
    renderCUDA's per-fragment alpha test instead; on TPU every surviving
    pair costs sorted-record bandwidth AND kernel lanes, so culling at
    emission is the structural win. Surviving candidates from the first
    `enum_cap` rect cells are rank-compacted into the K slots (a tiny
    one-hot sum over the static enum axis — no gather), so K bounds the
    PASSING tiles per gaussian, not its rect size.
    """
    k_cap = max_tiles_per_gaussian
    num_tiles = grid_h * grid_w
    n = proj.depth.shape[0]
    tx0, ty0, tx1, ty1, raw_count = tile_rect(proj, tile_h, tile_w,
                                              grid_h, grid_w)
    gid = jnp.broadcast_to(
        lax.broadcasted_iota(jnp.int32, (k_cap, n), 1), (k_cap, n))

    if opacity is None or enum_cap <= k_cap:
        count = jnp.minimum(raw_count, k_cap)
        n_dropped_rect = jnp.sum(raw_count - count)
        # (K, N): sublanes = rect slot, lanes = gaussian (keep N minor!)
        kk = lax.broadcasted_iota(jnp.int32, (k_cap, n), 0)
        rw = jnp.maximum(tx1 - tx0, 1)[None, :]
        ty = ty0[None, :] + kk // rw
        tx = tx0[None, :] + kk % rw
        ok = kk < count[None, :]
        tile_key = jnp.where(ok, ty * grid_w + tx,
                             num_tiles).astype(jnp.int32)
        return (tile_key.reshape(-1), gid.reshape(-1),
                n_dropped_rect.astype(jnp.int32))

    # ---- exact-cull path: enumerate up to enum_cap rect cells ----
    cc = lax.broadcasted_iota(jnp.int32, (enum_cap, n), 0)
    rw = jnp.maximum(tx1 - tx0, 1)[None, :]
    ty = ty0[None, :] + cc // rw
    tx = tx0[None, :] + cc % rw
    in_rect = cc < jnp.minimum(raw_count, enum_cap)[None, :]

    # lam_min * |d|^2 lower-bounds the conic quadratic form; the bound's
    # exp therefore upper-bounds every pixel's alpha in the tile box.
    mid = 0.5 * (proj.conic_a + proj.conic_c)
    dif = 0.5 * (proj.conic_a - proj.conic_c)
    lam_min = jnp.maximum(
        mid - jnp.sqrt(dif * dif + proj.conic_b * proj.conic_b), 0.0)
    bx0 = (tx * tile_w).astype(jnp.float32)
    by0 = (ty * tile_h).astype(jnp.float32)
    x, y = proj.x2d[None, :], proj.y2d[None, :]
    ddx = jnp.maximum(jnp.maximum(bx0 - x, x - (bx0 + (tile_w - 1))), 0.0)
    ddy = jnp.maximum(jnp.maximum(by0 - y, y - (by0 + (tile_h - 1))), 0.0)
    d2 = ddx * ddx + ddy * ddy
    bound = opacity[None, :] * jnp.exp(-0.5 * lam_min[None, :] * d2)
    # 0.999: the bound dominates the true max alpha mathematically; the
    # margin keeps float evaluation noise from ever crossing the gate.
    ok_cell = in_rect & (bound >= ALPHA_EPS * 0.999)

    rank = jnp.cumsum(ok_cell.astype(jnp.int32), axis=0) - 1
    key_cell = jnp.where(ok_cell, ty * grid_w + tx, 0)
    slots = []
    for k in range(k_cap):
        hit = ok_cell & (rank == k)
        slots.append(jnp.sum(jnp.where(hit, key_cell + 1, 0), axis=0) - 1)
    tile_key = jnp.stack(slots, 0)
    tile_key = jnp.where(tile_key >= 0, tile_key,
                         num_tiles).astype(jnp.int32)

    pass_count = jnp.sum(ok_cell.astype(jnp.int32), axis=0)
    # Conservative drop count: passing cells beyond the K slots, plus rect
    # cells past the enum window (untested). For the untested cells, use
    # the alpha-REACH bound instead of assuming they would all pass: a cell
    # passes only if its box is within dmax = sqrt(2 ln(op/eps)/lam_min)
    # of the center, so at most `passable` (the rect cells intersecting the
    # dmax square) can pass in total. Without this, a single huge dim splat
    # (rect >> enum window, alpha-culled everywhere) reports thousands of
    # phantom drops and drives the trainers' K escalation into spurious
    # recompiles (still >= the true drop count: disk subset of square, and
    # the per-axis tile ranges over-cover the box-intersection test).
    safe_op = jnp.maximum(opacity, ALPHA_EPS)
    dmax = jnp.sqrt(2.0 * jnp.log(safe_op / (ALPHA_EPS * 0.999))
                    / jnp.maximum(lam_min, 1e-12))
    dmax = jnp.minimum(dmax, jnp.float32(
        (grid_w + 1) * tile_w + (grid_h + 1) * tile_h))
    nx = (jnp.floor((proj.x2d + dmax) / tile_w)
          - jnp.floor((proj.x2d - dmax) / tile_w) + 1.0)
    ny = (jnp.floor((proj.y2d + dmax) / tile_h)
          - jnp.floor((proj.y2d - dmax) / tile_h) + 1.0)
    passable = (nx * ny).astype(jnp.int32)
    beyond = jnp.minimum(jnp.maximum(raw_count - enum_cap, 0), passable)
    n_dropped_rect = (jnp.sum(jnp.maximum(pass_count - k_cap, 0))
                      + jnp.sum(beyond))
    return (tile_key.reshape(-1), gid.reshape(-1),
            n_dropped_rect.astype(jnp.int32))


def tile_ranges(sorted_tile: jnp.ndarray, num_tiles: int):
    """Per-tile [start, count) ranges of a tile-sorted pair list."""
    bounds = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    return bounds[:-1], bounds[1:] - bounds[:-1]


def sort_pairs(tile_key: jnp.ndarray, depth_key: jnp.ndarray,
               payload: Sequence[jnp.ndarray]):
    """Two-key (tile, depth) unstable sort carrying arbitrary payload rows.

    Matches the CUDA radix sort's ordering semantics (front-to-back by view z
    within each tile, rasterizer_impl.cu:102-104, 306-314); ties are broken
    arbitrarily where the reference breaks them by emission order — both are
    valid orderings of equal-depth gaussians.
    """
    out = lax.sort((tile_key, depth_key) + tuple(payload), num_keys=2,
                   is_stable=False)
    return out[0], out[1], out[2:]


def bin_gaussians(proj: Projected, tile_h: int, tile_w: int,
                  grid_h: int, grid_w: int,
                  pair_capacity: int,
                  max_tiles_per_gaussian: int = 16) -> TileBins:
    """Bin projected gaussians into per-tile, depth-sorted id lists.

    This is the gather-based consumer interface (XLA oracle path / tests);
    the production pallas path uses `emit_pairs` + `sort_pairs` directly with
    record payloads (ops/sorted_raster.py) and no capacity truncation.
    """
    num_tiles = grid_h * grid_w
    tile_key, gid, n_dropped_rect = emit_pairs(proj, tile_h, tile_w, grid_h,
                                               grid_w, max_tiles_per_gaussian)
    sorted_tile, _, (sorted_gid,) = sort_pairs(
        tile_key, jnp.where(proj.valid, proj.depth, jnp.inf)[
            jnp.newaxis].repeat(max_tiles_per_gaussian, 0).reshape(-1),
        (gid,))
    num_pairs = jnp.sum((sorted_tile < num_tiles).astype(jnp.int32))

    cap = min(pair_capacity, sorted_tile.shape[0])
    sorted_tile = sorted_tile[:cap]
    sorted_gid = sorted_gid[:cap]
    if cap < pair_capacity:
        sorted_tile = jnp.pad(sorted_tile, (0, pair_capacity - cap),
                              constant_values=num_tiles)
        sorted_gid = jnp.pad(sorted_gid, (0, pair_capacity - cap))
    starts, counts = tile_ranges(sorted_tile, num_tiles)
    n_dropped_capacity = jnp.maximum(num_pairs - cap, 0)
    return TileBins(
        gaussian_ids=sorted_gid,
        tile_starts=starts,
        tile_counts=counts,
        num_pairs=num_pairs.astype(jnp.int32),
        n_dropped_capacity=n_dropped_capacity.astype(jnp.int32),
        n_dropped_rect=n_dropped_rect,
    )
