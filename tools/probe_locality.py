"""Offline (CPU) locality study for the frozen 20-NN rigidity graph.

Question it answers (VERDICT r4 item 3 groundwork): if the capacity table
is row-reordered once at the t0 graph build, what window W covers what
fraction of neighbor edges?  That sets the (static) window width of the
windowed one-hot MXU neighbor fetch that replaces the per-step 2.4M-row
XLA gather (measured ~10 ns/element through the relay — the dominant cost
of the t>0 train step, see PROFILE.md r5).

Orderings compared:
  * none      — initial point-cloud order + densify appends (the status quo)
  * morton    — 3D Morton (Z-curve) on quantized positions
  * rcm       — reverse Cuthill-McKee on the symmetrized kNN graph
                (scipy.sparse.csgraph; host-side, one-shot at t0)

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python tools/probe_locality.py
"""

from __future__ import annotations

import json

import numpy as np


def morton_order(pts: np.ndarray, bits: int = 10) -> np.ndarray:
    q = pts - pts.min(0)
    q = (q / max(q.max(), 1e-9) * (2**bits - 1)).astype(np.uint64)

    def spread(x):
        x &= np.uint64(0x3FF)
        x = (x | (x << np.uint64(16))) & np.uint64(0x30000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x300F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x30C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x9249249)
        return x

    code = (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))
    return np.argsort(code, kind="stable")


def rcm_order(idx: np.ndarray, n: int) -> np.ndarray:
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    src = np.repeat(np.arange(n), idx.shape[1])
    dst = idx.reshape(-1)
    ok = dst >= 0
    src, dst = src[ok], dst[ok]
    a = coo_matrix((np.ones_like(src, np.int8), (src, dst)),
                   shape=(n, n)).tocsr()
    a = a + a.T
    return np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True))


def edge_spans(idx: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """|newpos(i) - newpos(j)| for every valid edge under row order perm."""
    n = idx.shape[0]
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    src = np.repeat(inv[np.arange(n)], idx.shape[1])
    dst = idx.reshape(-1)
    ok = dst >= 0
    return np.abs(src[ok] - inv[dst[ok]])


def main():
    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.data import synthetic
    from dynamic3dgaussians_tpu.ops.knn import knn

    # ~the post-densify population of the r5 dynamic run (95,908 alive)
    scene = synthetic.make_gt_scene(n_fg=48_000, n_bg=48_000, seed=0)
    pts = np.asarray(scene["means"], np.float32)
    n = pts.shape[0]
    is_fg = np.zeros(n, bool)
    is_fg[: scene["n_fg"]] = True

    _, idx = knn(jnp.asarray(pts), 20, mask=jnp.asarray(is_fg))
    idx = np.asarray(idx)

    perms = {
        "none": np.arange(n),
        "morton": morton_order(pts),
        "rcm": rcm_order(idx, n),
    }
    out = {}
    for name, perm in perms.items():
        spans = edge_spans(idx, perm)
        row = {"edges": int(spans.size),
               "bandwidth_max": int(spans.max()),
               "span_p50": int(np.percentile(spans, 50)),
               "span_p99": int(np.percentile(spans, 99)),
               "span_p999": int(np.percentile(spans, 99.9))}
        for w in (512, 1024, 2048, 4096, 8192):
            row[f"cover_W{w}"] = round(float((spans <= w // 2).mean()), 5)
        out[name] = row
        print(name, json.dumps(row))
    with open("artifacts/locality_probe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
