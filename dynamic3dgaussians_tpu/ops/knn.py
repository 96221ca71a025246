"""Exact k-nearest-neighbors on TPU via chunked MXU distance matmuls.

TPU-native replacement for both kNN paths of the reference:
  * simple-knn CUDA extension (Morton sort + box pruning,
    …/simple-knn/simple_knn.cu:45-228) used for 3-NN log-scale init, and
  * the host-side Open3D KDTree hop (reference helpers.py:136-146 `o3d_knn`)
    used for the 20-NN rigidity graph — a device->host->device round trip the
    reference pays once per sequence; here it stays on device.

Squared distances decompose as |a|^2 + |b|^2 - 2 a.b — the cross term is a
(rows, cols) matmul the MXU eats. We tile rows x columns and keep a running
top-k merge, so memory is O(row_chunk * col_chunk) and the result is *exact*
(verified against brute force in tests), unlike the reference's windowed
Morton approximation for the reject radius.
"""

from __future__ import annotations

from functools import partial

import jax
from jax import lax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "row_chunk", "col_chunk",
                                   "exclude_self"))
def knn(points: jnp.ndarray, k: int, *, mask: jnp.ndarray | None = None,
        row_chunk: int = 1024, col_chunk: int = 4096,
        exclude_self: bool = True):
    """Exact k-NN over a point set.

    Args:
      points: (N, D) float32.
      k: number of neighbors (static).
      mask: optional (N,) bool; masked-out points neither query nor serve as
        neighbors (their rows return inf/-1). Used with capacity-padded
        gaussian tables.
      exclude_self: drop the zero-distance self match (reference o3d_knn
        semantics: search k+1, skip the first).

    Returns:
      (sq_dists (N, k) float32, indices (N, k) int32); masked/overflow slots
      hold inf / -1.
    """
    n, _ = points.shape
    pad_rows = (-n) % row_chunk
    pad_cols = (-n) % col_chunk
    valid = jnp.ones((n,), bool) if mask is None else mask
    pts_r = jnp.pad(points, ((0, pad_rows), (0, 0)))
    valid_r = jnp.pad(valid, (0, pad_rows))
    pts_c = jnp.pad(points, ((0, pad_cols), (0, 0)))
    valid_c = jnp.pad(valid, (0, pad_cols))
    n_cols = pts_c.shape[0]

    def row_block(start):
        rows = jax.lax.dynamic_slice_in_dim(pts_r, start, row_chunk, 0)
        rows_ok = jax.lax.dynamic_slice_in_dim(valid_r, start, row_chunk, 0)
        row_ids = start + jnp.arange(row_chunk)
        sq_r = jnp.sum(rows * rows, axis=-1)

        def col_block(carry, cstart):
            best_d, best_i = carry
            cols = jax.lax.dynamic_slice_in_dim(pts_c, cstart, col_chunk, 0)
            cols_ok = jax.lax.dynamic_slice_in_dim(valid_c, cstart,
                                                   col_chunk, 0)
            col_ids = cstart + jnp.arange(col_chunk)
            cross = jax.lax.dot_general(
                rows, cols, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            d2 = (sq_r[:, None] + jnp.sum(cols * cols, -1)[None, :]
                  - 2.0 * cross)
            d2 = jnp.maximum(d2, 0.0)
            bad = ~cols_ok[None, :]
            if exclude_self:
                bad = bad | (row_ids[:, None] == col_ids[None, :])
            d2 = jnp.where(bad, jnp.inf, d2)
            # merge with running top-k (top_k over negated distances)
            cand_d = jnp.concatenate([best_d, d2], axis=1)
            cand_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(col_ids[None, :], d2.shape)], axis=1)
            neg_top, pos = jax.lax.top_k(-cand_d, k)
            return (-neg_top, jnp.take_along_axis(cand_i, pos, axis=1)), None

        init = (jnp.full((row_chunk, k), jnp.inf),
                jnp.full((row_chunk, k), -1, jnp.int32))
        (bd, bi), _ = jax.lax.scan(col_block, init,
                                   jnp.arange(0, n_cols, col_chunk))
        bd = jnp.where(rows_ok[:, None], bd, jnp.inf)
        bi = jnp.where(rows_ok[:, None] & jnp.isfinite(bd), bi, -1)
        return bd, bi

    starts = jnp.arange(0, n + pad_rows, row_chunk)
    dists, idx = jax.lax.map(row_block, starts)
    return (dists.reshape(-1, k)[:n], idx.reshape(-1, k)[:n])


def mean3_sq_dist(points: jnp.ndarray, mask: jnp.ndarray | None = None,
                  clip_min: float = 1e-7) -> jnp.ndarray:
    """Mean squared distance to the 3 nearest neighbors.

    The simple-knn quantity used to initialize log_scales
    (reference train_beffor.py:116-117, scene/gaussian_model.py:162).
    """
    d, _ = knn(points, 3, mask=mask)
    d = jnp.where(jnp.isfinite(d), d, 0.0)
    return jnp.clip(jnp.mean(d, axis=-1), min=clip_min)


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits to every 3rd bit (Morton interleave helper)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_codes(points: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                 shift: float = 0.0, order=(0, 1, 2)) -> jnp.ndarray:
    """30-bit Morton codes of (N, 3) points in the [lo, hi] box
    (the simple-knn coding, …/simple-knn/simple_knn.cu:45-70).

    `shift` (in [0, 0.5], fraction of the domain) and `order` (axis
    interleave permutation) diversify the space-filling curve for
    multi-grid queries: Morton locality fails at power-of-2 cell
    boundaries, and shifted/rotated grids fail at DIFFERENT boundaries.
    """
    scale = 680.0 / jnp.maximum(hi - lo, 1e-12)   # leave room for the shift
    q = jnp.clip((points - lo) * scale + shift * 680.0,
                 0.0, 1023.0).astype(jnp.int32)
    a, b, c = order
    return (_part1by2(q[:, a]) | (_part1by2(q[:, b]) << 1)
            | (_part1by2(q[:, c]) << 2))


@partial(jax.jit, static_argnames=("k", "window", "grids"))
def knn_approx(points: jnp.ndarray, k: int, *,
               mask: jnp.ndarray | None = None, window: int = 32,
               grids: int = 2):
    """Approximate k-NN via Morton-order windows — O(N * window * grids).

    The TPU-native analogue of simple-knn's Morton sort + windowed candidate
    search (…/simple-knn/simple_knn.cu:78-190): sort by Morton code (payload
    sort, no gathers), take the +-window sorted neighbors as candidates via
    shifted slices, top-k merge; repeat on half-cell-shifted grids to patch
    cell-boundary misses. Exact `knn` is O(N^2) matmuls — use this above
    ~500k points (at 1M: seconds vs minutes).

    Returns (sq_dists (N, k), indices (N, k)); masked/unfound slots hold
    inf / -1.
    """
    n = points.shape[0]
    valid = jnp.ones((n,), bool) if mask is None else mask
    big = jnp.where(valid[:, None], points, jnp.inf)
    lo = jnp.min(jnp.where(valid[:, None], points, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], points, -jnp.inf), axis=0)

    best_d = jnp.full((n, k), jnp.inf)
    best_i = jnp.full((n, k), -1, jnp.int32)

    grid_cfg = [(0.0, (0, 1, 2)), (0.37, (1, 2, 0)), (0.21, (2, 0, 1)),
                (0.5, (0, 1, 2))]
    for g in range(grids):
        shift, order = grid_cfg[g % len(grid_cfg)]
        code = morton_codes(points, lo, hi, shift=shift, order=order)
        code = jnp.where(valid, code, jnp.int32(2 ** 30))  # invalid to back
        idx0 = lax.broadcasted_iota(jnp.int32, (1, n), 1)[0]
        sc, sx, sy, sz, si, sv = lax.sort(
            (code, points[:, 0], points[:, 1], points[:, 2], idx0,
             valid.astype(jnp.int32)), num_keys=1, is_stable=False)

        cand_d, cand_i = [], []
        pos = idx0
        for off in range(1, window + 1):
            for sgn in (1, -1):
                d = off * sgn
                # shifted views (pad with inf at the boundary)
                def sh(a, fill):
                    if d > 0:
                        return jnp.concatenate([a[d:], jnp.full((d,), fill,
                                                                a.dtype)])
                    return jnp.concatenate([jnp.full((-d,), fill, a.dtype),
                                            a[:d]])
                ox, oy, oz = sh(sx, jnp.inf), sh(sy, jnp.inf), sh(sz, jnp.inf)
                oi = sh(si, -1)
                ov = sh(sv, 0)
                d2 = (sx - ox) ** 2 + (sy - oy) ** 2 + (sz - oz) ** 2
                d2 = jnp.where((ov > 0) & (sv > 0), d2, jnp.inf)
                cand_d.append(d2)
                cand_i.append(oi)
        cd = jnp.stack(cand_d, axis=1)                  # (N, 2W) sorted order
        ci = jnp.stack(cand_i, axis=1)
        neg_top, sel = lax.top_k(-cd, k)
        gd = -neg_top
        gi = jnp.take_along_axis(ci, sel, axis=1)
        # back to original order: payload sort keyed on the original index
        un = lax.sort((si,) + tuple(gd.T) + tuple(gi.T.astype(jnp.float32)),
                      num_keys=1, is_stable=False)
        gd = jnp.stack(un[1:1 + k], axis=1)
        gi = jnp.stack(un[1 + k:], axis=1).astype(jnp.int32)
        # merge with the running best (dedupe not needed for distance use;
        # for index use, duplicates across grids resolve to the same point)
        cat_d = jnp.concatenate([best_d, gd], axis=1)
        cat_i = jnp.concatenate([best_i, gi], axis=1)
        # drop duplicate indices (keep first occurrence) before the merge
        dup = jnp.zeros_like(cat_d, dtype=bool)
        for a in range(k, 2 * k):
            same = cat_i[:, a:a + 1] == cat_i[:, :k]
            dup = dup.at[:, a].set(jnp.any(same & (cat_i[:, a:a + 1] >= 0),
                                           axis=1))
        cat_d = jnp.where(dup, jnp.inf, cat_d)
        neg_top, sel = lax.top_k(-cat_d, k)
        best_d = -neg_top
        best_i = jnp.take_along_axis(cat_i, sel, axis=1)

    best_d = jnp.where(valid[:, None], best_d, jnp.inf)
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    return best_d, best_i
