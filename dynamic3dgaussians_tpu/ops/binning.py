"""Tile binning: (gaussian, tile) pair emission + device sort + tile ranges.

TPU-native equivalent of the reference's `duplicateWithKeys` + CUB radix sort
+ `identifyTileRanges` pipeline (…/cuda_rasterizer/rasterizer_impl.cu:68-138,
281-324). The CUDA version builds a data-dependent number of 64-bit
(tile | depth-bits) keys; XLA needs static shapes, so we use capacity-padded
buffers (SURVEY.md §7 "hard part iii"):

  * each gaussian may emit up to `max_tiles_per_gaussian` pairs (its clamped
    tile rect, row-major),
  * pairs are scattered at exclusive-prefix-sum offsets into a buffer of
    static capacity `pair_capacity` (out-of-capacity pairs drop and are
    *counted*, never silently lost),
  * a lexicographic `lax.sort` over (tile_id, depth) with stable id payload
    replaces the radix sort — same ordering semantics: per tile,
    front-to-back by view z with stable ties,
  * per-tile [start, count) ranges come from two `searchsorted` calls.

Everything here is integer plumbing with zero gradients; gradients flow
through the gathered per-gaussian records in the renderer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from dynamic3dgaussians_tpu.ops.projection import Projected, tile_rect


class TileBins(NamedTuple):
    gaussian_ids: jnp.ndarray   # (pair_capacity,) int32, sorted by (tile, z)
    tile_starts: jnp.ndarray    # (num_tiles,) int32 index into gaussian_ids
    tile_counts: jnp.ndarray    # (num_tiles,) int32 pairs per tile
    num_pairs: jnp.ndarray      # () int32 total pairs emitted (pre-drop)
    n_dropped_capacity: jnp.ndarray  # () int32 pairs dropped at pair_capacity
    n_dropped_rect: jnp.ndarray      # () int32 pairs dropped by per-gaussian cap


def bin_gaussians(proj: Projected, tile_h: int, tile_w: int,
                  grid_h: int, grid_w: int,
                  pair_capacity: int,
                  max_tiles_per_gaussian: int = 16) -> TileBins:
    """Bin projected gaussians into per-tile, depth-sorted id lists.

    Pairs are emitted in global front-to-back order (gaussians pre-sorted by
    view depth, N log N on N not on the pair count), so one *single-key*
    stable sort by tile id finishes the job — the depth bits the CUDA
    version packs into its 64-bit radix keys (rasterizer_impl.cu:102-104)
    ride along for free in the emission order.
    """
    num_tiles = grid_h * grid_w
    rect_min, rect_max, raw_count = tile_rect(proj, tile_h, tile_w,
                                              grid_h, grid_w)
    count = jnp.minimum(raw_count, max_tiles_per_gaussian)
    n_dropped_rect = jnp.sum(jnp.maximum(raw_count - max_tiles_per_gaussian, 0))

    # front-to-back gaussian order (stable; invalid to the back)
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    rect_min, rect_max, count = rect_min[order], rect_max[order], count[order]

    offsets = jnp.cumsum(count) - count          # exclusive prefix sum
    num_pairs = offsets[-1] + count[-1]

    # Enumerate each gaussian's rect row-major (duplicateWithKeys semantics).
    j = jnp.arange(max_tiles_per_gaussian, dtype=jnp.int32)
    rw = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)
    ty = rect_min[:, 1][:, None] + j[None, :] // rw[:, None]
    tx = rect_min[:, 0][:, None] + j[None, :] % rw[:, None]
    tile_id = ty * grid_w + tx                       # (N, K)
    pair_ok = j[None, :] < count[:, None]

    pos = offsets[:, None] + j[None, :]
    pos = jnp.where(pair_ok & (pos < pair_capacity), pos, pair_capacity)
    n_dropped_capacity = jnp.maximum(num_pairs - pair_capacity, 0)

    gid = jnp.broadcast_to(order.astype(jnp.int32)[:, None], tile_id.shape)

    flat_pos = pos.reshape(-1)
    buf_tile = jnp.full((pair_capacity,), num_tiles, jnp.int32).at[flat_pos]\
        .set(tile_id.reshape(-1).astype(jnp.int32), mode="drop")
    buf_gid = jnp.zeros((pair_capacity,), jnp.int32).at[flat_pos]\
        .set(gid.reshape(-1), mode="drop")

    sorted_tile, sorted_gid = lax.sort(
        (buf_tile, buf_gid), num_keys=1, is_stable=True)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
    return TileBins(
        gaussian_ids=sorted_gid,
        tile_starts=starts,
        tile_counts=ends - starts,
        num_pairs=num_pairs.astype(jnp.int32),
        n_dropped_capacity=n_dropped_capacity.astype(jnp.int32),
        n_dropped_rect=n_dropped_rect.astype(jnp.int32),
    )


def aligned_pair_layout(bins: TileBins, chunk: int, max_per_tile: int,
                        aligned_capacity: int):
    """Re-lay the sorted pair list into chunk-aligned per-tile segments.

    The Pallas kernel wants each tile's record list to start at a multiple of
    `chunk` in HBM so its DMAs are aligned contiguous slices. Tile t occupies
    slots [aligned_starts[t], aligned_starts[t] + n_chunks[t]*chunk); slack
    slots map to gaussian 0 with valid=False (the caller zeroes opacity
    there, so they composite as nothing).

    Returns:
      gid (aligned_capacity,) int32 — gaussian id per aligned slot,
      valid (aligned_capacity,) bool,
      aligned_starts (num_tiles,) int32,
      n_chunks (num_tiles,) int32 — chunk count per tile (counts clamped to
        max_per_tile; overflow is already reported by the caller).
    """
    counts = jnp.minimum(bins.tile_counts, max_per_tile)
    n_chunks = -(-counts // chunk)
    aligned_counts = n_chunks * chunk
    aligned_starts = (jnp.cumsum(aligned_counts) - aligned_counts).astype(
        jnp.int32)

    num_tiles = aligned_starts.shape[0]
    # tile-of-slot via scatter-max + cumulative max (cheaper than a
    # searchsorted over the whole aligned capacity); start-position ties
    # (empty tiles) resolve to the highest tile index, whose j test is the
    # meaningful one.
    marks = jnp.zeros((aligned_capacity,), jnp.int32).at[aligned_starts].max(
        jnp.arange(num_tiles, dtype=jnp.int32), mode="drop")
    tile_of = lax.cummax(marks)
    slot = jnp.arange(aligned_capacity, dtype=jnp.int32)
    j = slot - aligned_starts[tile_of]
    valid = j < counts[tile_of]
    src = bins.tile_starts[tile_of] + j
    gid = bins.gaussian_ids[jnp.clip(src, 0, bins.gaussian_ids.shape[0] - 1)]
    gid = jnp.where(valid, gid, 0)
    return gid, valid, aligned_starts, n_chunks.astype(jnp.int32)
