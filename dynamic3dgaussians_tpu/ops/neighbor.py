"""Fixed-graph neighbor lookup with a sort-based (scatter-free) backward.

The rigidity-loss family reads, every training step, a per-gaussian record
for each of its K fixed neighbors: `rec[i, k] = tbl[idx[i, k]]`
(reference train.py:253-285 via torch fancy indexing; upstream measured this
family as its hot loop, README.md:90-92). On TPU the forward gather is
acceptable (one wide row-gather), but plain autodiff's transpose is a
4M-row scatter-add — measured ~110 ms at 200k gaussians x K=20, ~25x the
cost of everything else in the loss.

`neighbor_lookup` replaces that transpose with sorts (near-memcpy on TPU):
the edge list is FIXED after the t=0 graph build, so we precompute, once:

  * rank[e]  — position of edge e in destination-sorted (by j = idx[e])
    order (invalid edges ranked past the end)
  * row_ptr  — CSR-style boundaries of each destination's run

and the backward becomes
  sort cotangents by the static rank  ->  destination-contiguous runs
  cumulative-sum along edges          ->  run sums by boundary differences
  one lane-gather at row_ptr          ->  per-gaussian gradient rows

— deterministic, race-free, no scatter (SURVEY.md §5.2). The forward output
is feature-major (F, K, cap) so all downstream per-edge math runs with the
big axis on TPU lanes (an (cap, K, 3) layout pads its minor dim 3 -> 128 and
wastes ~40x HBM bandwidth).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class EdgeReduction(NamedTuple):
    """Static backward plan for a fixed neighbor graph."""
    rank: jnp.ndarray      # (cap*K,) int32 — j-sorted position per edge slot
    row_ptr: jnp.ndarray   # (cap + 1,) int32 — run boundaries per destination
    n_valid: int           # number of valid edges (static)


class WindowPlan(NamedTuple):
    """Static FORWARD plan: the windowed one-hot MXU neighbor fetch.

    XLA's row-gather runs at ~4-10 ns/element on TPU (scalar-core bound;
    PROFILE.md r5 probe C) — at 2M edges x 8 lanes that is the dominant
    cost of the whole t>0 train step. But the rigidity graph is FROZEN
    after t0, so the table can be row-reordered ONCE (reverse
    Cuthill-McKee on the kNN graph bounds every edge's index span to
    ~n_fg^(2/3); measured 4,085 at 48k foreground points) and the fetch
    becomes, per 256-destination block, `one_hot(idx_local) @ window` —
    a dense MXU matmul over a static window of W source rows. Exact for
    valid edges; invalid/out-of-window edges read 0 (mask downstream,
    matching the lookup contract). Out-of-window edges (none under RCM
    unless W is capped) are patched by a tiny exact gather (`spill_*`).
    """
    win_start: jnp.ndarray   # (n_blocks,) int32 window row offset per block
    idx_local: jnp.ndarray   # (n_dst_pad, K) int32 in-window index, -1 dead
    lanes: jnp.ndarray       # (W,) int32 iota — carries the static W
    spill_row: jnp.ndarray   # (S,) int32 destination row of spill edges
    spill_k: jnp.ndarray     # (S,) int32 destination k-slot of spill edges
    spill_src: jnp.ndarray   # (S,) int32 source row of spill edges
    # (block size is implicit: idx_local.shape[0] // win_start.shape[0] —
    # an all-array pytree keeps custom_vjp cotangent plumbing trivial)


def build_window_plan(idx: np.ndarray, n_dst: int, *, block: int = 256,
                      w_max: int = 8192) -> WindowPlan:
    """Precompute the forward plan from (cap, K) neighbor indices.

    Args:
      idx: (cap, K) int32, -1 = invalid. Valid edges must only occur in
        rows < n_dst (the foreground prefix after the locality reorder).
      n_dst: number of destination rows to cover (rows beyond read 0).
      block: destination rows per matmul block (MXU-friendly multiple).
      w_max: cap on the static window width; edges spanning further go to
        the exact spill list (RCM keeps this empty in practice).
    """
    idx = np.asarray(idx)
    cap, k = idx.shape
    n_dst_pad = -(-max(n_dst, 1) // block) * block
    n_blocks = n_dst_pad // block
    tgt = np.full((n_dst_pad, k), -1, np.int64)
    tgt[: min(n_dst, cap)] = idx[: min(n_dst, cap)]
    tgt_b = tgt.reshape(n_blocks, block * k)
    valid_b = tgt_b >= 0
    lo = np.where(valid_b.any(1), np.where(valid_b, tgt_b, cap).min(1), 0)
    hi = np.where(valid_b.any(1), np.where(valid_b, tgt_b, -1).max(1), 0)
    span = int((hi - lo).max()) + 1 if n_dst > 0 else 1
    w = min(w_max, -(-(span + 8) // 128) * 128)
    w = min(w, -(-cap // 128) * 128)
    ws = np.minimum(np.maximum(lo - 4, 0), max(cap - w, 0)) // 8 * 8
    local = tgt - ws.repeat(block)[:, None]
    in_win = (tgt >= 0) & (local >= 0) & (local < w)
    idx_local = np.where(in_win, local, -1).astype(np.int32)
    sp = np.argwhere((tgt >= 0) & ~in_win)
    return WindowPlan(
        jnp.asarray(ws, jnp.int32), jnp.asarray(idx_local),
        jnp.arange(w, dtype=jnp.int32),
        jnp.asarray(sp[:, 0], jnp.int32), jnp.asarray(sp[:, 1], jnp.int32),
        jnp.asarray(tgt[sp[:, 0], sp[:, 1]], jnp.int32))


def locality_order(idx: np.ndarray, rows: np.ndarray, cap: int) -> np.ndarray:
    """Reverse Cuthill-McKee order of the `rows` subgraph of the kNN graph.

    Returns a (cap,) permutation placing `rows` first (RCM-ordered so every
    edge's index span is bounded), then the rest in original order. Applied
    once at the t0 graph build; host-side scipy (falls back to a Morton-free
    identity-of-subset order if scipy is unavailable)."""
    idx = np.asarray(idx)
    rows = np.asarray(rows)
    n_sub = rows.shape[0]
    inv_sub = np.full(cap, -1, np.int64)
    inv_sub[rows] = np.arange(n_sub)
    sub_idx = inv_sub[np.maximum(idx[rows], 0)]
    sub_idx[idx[rows] < 0] = -1
    try:
        from scipy.sparse import coo_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        src = np.repeat(np.arange(n_sub), sub_idx.shape[1])
        dst = sub_idx.reshape(-1)
        ok = dst >= 0
        a = coo_matrix((np.ones(ok.sum(), np.int8), (src[ok], dst[ok])),
                       shape=(n_sub, n_sub)).tocsr()
        a = a + a.T
        sub_order = np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True))
    except ImportError:                            # pragma: no cover
        sub_order = np.arange(n_sub)
    rest = np.ones(cap, bool)
    rest[rows] = False
    return np.concatenate([rows[sub_order], np.flatnonzero(rest)])


def build_edge_reduction(idx: np.ndarray,
                         n_dst: Optional[int] = None) -> EdgeReduction:
    """Precompute the backward plan from (cap, K) neighbor indices (-1 =
    invalid). Host-side numpy; runs once per sequence at graph build.

    n_dst restricts the plan to the first n_dst destination ROWS (rounded
    up to 8): when the graph lives on a prefix of the capacity table (the
    post-t0 foreground rows after the fg-first locality reorder), both the
    forward gather and the backward rank-sort then ride cap/n_dst fewer
    edge slots — measured 2.6x at the 131k-cap/49k-fg scale, where the
    fetch fwd+bwd IS the whole physics-loss cost (artifacts/
    neighbor_window_probe.log). Requires every valid edge to sit in rows
    < n_dst (asserted) AND all sources < n_dst (kNN within the prefix
    set) so dropped rows carry no gradient.
    """
    idx = np.asarray(idx)
    cap = idx.shape[0]
    if n_dst is not None and n_dst < cap:
        n_dst = min(-(-n_dst // 8) * 8, cap)
        assert (idx[n_dst:] < 0).all(), \
            "valid edges beyond n_dst — run the fg-first reorder first"
        assert (idx[:n_dst] < n_dst).all(), "edge source outside the prefix"
        idx = idx[:n_dst]
    rows = idx.shape[0]
    j = idx.reshape(-1).astype(np.int64)
    invalid = j < 0
    j_sortkey = np.where(invalid, rows, j)         # invalid to the back
    order = np.argsort(j_sortkey, kind="stable")   # edge slots, j-sorted
    rank = np.empty_like(order)
    rank[order] = np.arange(order.shape[0])
    n_valid = int((~invalid).sum())
    counts = np.bincount(j[~invalid], minlength=rows)
    row_ptr = np.zeros(rows + 1, np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    return EdgeReduction(jnp.asarray(rank, jnp.int32),
                         jnp.asarray(row_ptr, jnp.int32), n_valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def neighbor_lookup(tbl: jnp.ndarray, idx: jnp.ndarray, plan: EdgeReduction,
                    k: int) -> jnp.ndarray:
    """rec[f, k, i] = tbl[idx[i, k], f]; invalid (idx < 0) rows read slot 0
    (mask downstream — their gradient is dropped exactly here). When the
    plan was built with n_dst < cap (prefix graph), rows >= n_dst read 0.0
    instead — same masking contract, cap/n_dst fewer gathered rows.

    Args:
      tbl: (cap, F) per-gaussian records, F % 8 == 0 recommended.
      idx: (cap, K) int32 neighbor indices, -1 invalid.
      plan: build_edge_reduction(idx) — MUST match idx (incl. its n_dst).
      k: static K (== idx.shape[1]).

    Returns: (F, K, cap) feature-major neighbor records.
    """
    return _lookup_fwd_impl(tbl, idx, plan)


def _lookup_fwd_impl(tbl, idx, plan):
    cap = idx.shape[0]
    n_dst = plan.row_ptr.shape[0] - 1              # static prefix length
    rec = tbl[jnp.maximum(idx[:n_dst], 0)]         # (n_dst, K, F) row-gather
    rec = rec.transpose(2, 1, 0)                   # (F, K, n_dst) packed
    if n_dst < cap:
        rec = jnp.pad(rec, ((0, 0), (0, 0), (0, cap - n_dst)))
    return rec


def _lookup_fwd_windowed(tbl, window: WindowPlan):
    """rec[f, k, i] via per-block one-hot MXU matmuls (see WindowPlan).

    Invalid edges read 0.0 (not slot 0 like the gather path) — downstream
    must mask, which every caller already does. Valid-edge values are
    bitwise-exact: a one-hot f32 dot at HIGHEST precision reproduces the
    f32 table entries (0/1 and the hi/mid/lo operand splits are exact)."""
    cap, f = tbl.shape
    w = window.lanes.shape[0]
    n_dst_pad, k = window.idx_local.shape
    n_blocks = window.win_start.shape[0]
    block_edges = (n_dst_pad // n_blocks) * k
    idx2 = window.idx_local.reshape(n_blocks, block_edges)

    def body(_, inp):
        ws, idxb = inp
        win = lax.dynamic_slice(tbl, (ws, jnp.int32(0)), (w, f))
        oh = (idxb[:, None] == window.lanes[None, :]).astype(tbl.dtype)
        return _, lax.dot(oh, win, precision=lax.Precision.HIGHEST)

    _, ys = lax.scan(body, None, (window.win_start, idx2))
    rec = ys.reshape(n_dst_pad, k, f)
    if window.spill_src.shape[0]:                  # exact out-of-window patch
        rec = rec.at[window.spill_row, window.spill_k].set(
            tbl[window.spill_src])
    rec = rec.transpose(2, 1, 0)                   # (F, K, n_dst_pad)
    if n_dst_pad < cap:
        rec = jnp.pad(rec, ((0, 0), (0, 0), (0, cap - n_dst_pad)))
    return rec[..., :cap]


def _lookup_fwd(tbl, idx, plan, k):
    return _lookup_fwd_impl(tbl, idx, plan), (tbl.shape, plan)


def _lookup_bwd(k, res, d_rec):
    (cap, f), plan = res
    n_dst = plan.row_ptr.shape[0] - 1              # static prefix length
    # (F, K, n_dst) -> (F, E) edge-major, E = n_dst*K in (i, k) slot order
    d_edges = d_rec[:, :, :n_dst].transpose(0, 2, 1).reshape(f, n_dst * k)
    # destination-sort every feature row with ONE payload sort on the
    # static rank (invalid edges land past n_valid and are dropped)
    sorted_rows = lax.sort((plan.rank,) + tuple(d_edges), num_keys=1,
                           is_stable=False)[1:]
    s = jnp.stack(sorted_rows, 0)                # (F, E) j-contiguous runs
    csum = jnp.cumsum(s, axis=1)
    zero = jnp.zeros((f, 1), s.dtype)
    csum = jnp.concatenate([zero, csum], axis=1)   # exclusive at boundaries
    bounds = csum[:, plan.row_ptr]                 # (F, n_dst+1) lane-gather
    d_tbl = (bounds[:, 1:] - bounds[:, :-1]).T     # (n_dst, F)
    if n_dst < cap:                 # prefix plan: no sources past n_dst
        d_tbl = jnp.pad(d_tbl, ((0, cap - n_dst), (0, 0)))
    d_idx = np.zeros((cap, k), jax.dtypes.float0)
    d_plan = EdgeReduction(
        np.zeros(plan.rank.shape, jax.dtypes.float0),
        np.zeros(plan.row_ptr.shape, jax.dtypes.float0), plan.n_valid)
    return d_tbl, d_idx, d_plan


neighbor_lookup.defvjp(_lookup_fwd, _lookup_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def neighbor_lookup_win(tbl: jnp.ndarray, idx: jnp.ndarray,
                        plan: EdgeReduction, window: WindowPlan,
                        k: int) -> jnp.ndarray:
    """`neighbor_lookup` with the windowed one-hot MXU forward (WindowPlan)
    and the same sort-based backward. Invalid edges read 0.0 here (vs
    slot 0 on the gather path) — all callers mask them downstream."""
    return _lookup_fwd_windowed(tbl, window)


def _lookup_win_fwd(tbl, idx, plan, window, k):
    shapes = tuple(a.shape for a in window)
    return _lookup_fwd_windowed(tbl, window), (tbl.shape, plan, shapes)


def _lookup_win_bwd(k, res, d_rec):
    tbl_shape, plan, win_shapes = res
    d_tbl, d_idx, d_plan = _lookup_bwd(k, (tbl_shape, plan), d_rec)
    d_window = WindowPlan(*(np.zeros(s, jax.dtypes.float0)
                            for s in win_shapes))
    return d_tbl, d_idx, d_plan, d_window


neighbor_lookup_win.defvjp(_lookup_win_fwd, _lookup_win_bwd)


def lookup_components(tbl_cols: Tuple[jnp.ndarray, ...], idx: jnp.ndarray,
                      plan: EdgeReduction,
                      window: Optional[WindowPlan] = None,
                      ) -> Tuple[jnp.ndarray, ...]:
    """Convenience: flat (cap,) columns in -> (K, cap) neighbor components
    out (padded internally to 8 lanes for the row-gather)."""
    f = len(tbl_cols)
    f_pad = -(-f // 8) * 8
    cols = list(tbl_cols) + [jnp.zeros_like(tbl_cols[0])] * (f_pad - f)
    tbl = jnp.stack(cols, axis=-1)                 # (cap, F)
    if window is not None:
        rec = neighbor_lookup_win(tbl, idx, plan, window, idx.shape[1])
    else:
        rec = neighbor_lookup(tbl, idx, plan, idx.shape[1])
    return tuple(rec[i] for i in range(f))
