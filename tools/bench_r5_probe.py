"""Round-5 structural-perf probe: where do the 8.57 ms actually go, and
which redesign pays?

VERDICT r4 item 1 demands a *measured* speed-of-light budget per stage and
a structural lever (not tuning). This probe gathers, in one TPU session:

  A. scene statistics at the bench scene — LIVE pairs after exact_cull,
     scheduled kernel chunks (incl. alignment waste), per-tile occupancy —
     for tile shapes 16x16 / 8x16 / 8x8 (the cells-per-live-pair lever),
  B. lax.sort cost vs (length, payload-row count) — prices compaction
     (sort fewer pairs), row-dropping (sort fewer rows) and small-tile
     emission growth (sort more pairs),
  C. gather price — prices sort-by-index + gather transport vs carrying
     payload rows through the sort,
  D. full-pipeline fps for the candidate tile shapes + prefix ablation of
     the winner (emission / +sort / +kernel attribution),
  E. the VERDICT item-2 A/B: fast (quantized-depth) vs depth_mode="exact"
     image deltas at the bench scene + fused-key tie-collision counts.

Methodology: pipelined timing only (utils/timing.py, PROFILE.md); every
phase under a worker-thread timeout so one hung Mosaic compile cannot
wedge the session (bench.py pattern).

Usage: PYTHONPATH=/root/repo timeout 3000 python tools/bench_r5_probe.py \
           [A B C D E] > artifacts/r5_probe.log
"""

from __future__ import annotations

import functools
import json
import sys
import threading

import numpy as np

PHASE_TIMEOUT_S = 900
OUT = {}


def timed(name, fn, *a, **k):
    box = {}

    def run():
        try:
            box["out"] = fn(*a, **k)
        except Exception as e:  # noqa: BLE001
            box["err"] = repr(e)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(PHASE_TIMEOUT_S)
    if th.is_alive():
        print(f"# {name}: blocked > {PHASE_TIMEOUT_S}s — abandoned",
              flush=True)
        return None
    if "err" in box:
        print(f"# {name}: failed: {box['err']}", flush=True)
        return None
    return box.get("out")


def emit(key, val):
    OUT[key] = val
    print(json.dumps({key: val}), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    enable()
    from dynamic3dgaussians_tpu.ops import binning
    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.ops.projection import project
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
    from dynamic3dgaussians_tpu.ops.sorted_raster import (depth_key_bits,
                                                          fuse_tile_depth_key)
    from dynamic3dgaussians_tpu.utils.timing import pipelined_ms

    phases = set(sys.argv[1:]) or {"A", "B", "C", "D", "E"}

    n, h, w = 200_000, 360, 640
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

    # tile-shape candidates: (tile_h, tile_w, K, enum_cap, chunk)
    shapes = [(16, 16, 4, 16, 256), (8, 16, 6, 24, 256), (8, 8, 8, 32, 256)]

    # ---------- A: live-pair statistics per tile shape ----------
    if "A" in phases:
        @functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
        def stats(th_, tw_, kc, cap):
            gh, gw = -(-h // th_), -(-w // tw_)
            proj = project(means, scales, quats, cam)
            tile_key, _, nd = binning.emit_pairs(
                proj, th_, tw_, gh, gw, kc, opacity=opac, enum_cap=cap)
            ntiles = gh * gw
            live = jnp.sum((tile_key < ntiles).astype(jnp.int32))
            # scheduled chunks, incl. down-alignment waste, for chunk sizes
            sk = jnp.sort(tile_key)
            bounds = jnp.searchsorted(
                sk, jnp.arange(ntiles + 1, dtype=jnp.int32)).astype(jnp.int32)
            starts, counts = bounds[:-1], bounds[1:] - bounds[:-1]
            out = {"live": live, "dropped": nd, "ntiles": ntiles,
                   "max_tile": jnp.max(counts), "p99_tile": jnp.percentile(
                       counts.astype(jnp.float32), 99)}
            for ch in (128, 256):
                shift = starts - (starts // ch) * ch
                nch = jnp.where(counts == 0, 0,
                                (shift + counts + ch - 1) // ch)
                out[f"chunks_{ch}"] = jnp.sum(nch)
            return out

        for th_, tw_, kc, cap, _ in shapes:
            r = timed(f"A[{th_}x{tw_}]",
                      lambda: {k: float(v) for k, v in
                               jax.device_get(stats(th_, tw_, kc, cap)
                                              ).items()})
            if r is not None:
                p = th_ * tw_
                r["slots"] = kc * n
                r["cells_M"] = r["live"] * p / 1e6
                ch = 256
                r[f"sched_cells_{ch}_M"] = r[f"chunks_{ch}"] * ch * p / 1e6
                emit(f"A_{th_}x{tw_}_K{kc}", r)

        # splat radius distribution (16px-tile reference frame)
        @jax.jit
        def radii():
            proj = project(means, scales, quats, cam)
            r = proj.radius.astype(jnp.float32)
            return {"mean": jnp.mean(r), "p50": jnp.percentile(r, 50),
                    "p90": jnp.percentile(r, 90),
                    "p99": jnp.percentile(r, 99), "max": jnp.max(r)}
        rr = timed("A[radii]", lambda: {k: float(v) for k, v in
                                        jax.device_get(radii()).items()})
        if rr is not None:
            emit("A_radius_px", rr)

    # ---------- B: sort cost vs (length, rows) ----------
    if "B" in phases:
        key_full = np.random.RandomState(1).randint(
            0, 2**30, size=1_638_400, dtype=np.int32)
        pay_full = np.random.RandomState(2).randint(
            0, 2**30, size=(5, 1_638_400), dtype=np.int32)
        kf = jnp.asarray(key_full)
        pf = jnp.asarray(pay_full)

        def sort_ms(length, rows):
            kk = kf[:length]
            pp = tuple(pf[i, :length] for i in range(rows))

            @jax.jit
            def do(s):
                out = lax.sort((kk + s.astype(jnp.int32),) + pp,
                               num_keys=1, is_stable=False)
                return out[0][-1]
            return pipelined_ms(lambda s: do(jnp.float32(s)), iters=20)

        for length in (409_600, 819_200, 1_228_800, 1_638_400):
            for rows in ((0, 2, 5) if length != 819_200 else
                         (0, 1, 2, 3, 4, 5)):
                ms = timed(f"B[{length}x{rows}]", sort_ms, length, rows)
                if ms is not None:
                    emit(f"B_sort_{length}_{rows}rows_ms", round(ms, 3))

    # ---------- C: gather price ----------
    if "C" in phases:
        L = 819_200
        perm_np = np.random.RandomState(3).permutation(L).astype(np.int32)
        perm = jnp.asarray(perm_np)
        tab = jnp.asarray(np.random.RandomState(4).randint(
            0, 2**30, size=(5, L), dtype=np.int32))

        def gather_ms(rows, outlen):
            p = perm[:outlen]

            @jax.jit
            def do(s):
                pp = (p + s.astype(jnp.int32)) % L
                return tuple(tab[i][pp] for i in range(rows))
            return pipelined_ms(lambda s: do(jnp.float32(s)), iters=20)

        for rows, outlen, tag in ((5, L, "full"), (5, 409_600, "half"),
                                  (1, L, "1row")):
            ms = timed(f"C[{tag}]", gather_ms, rows, outlen)
            if ms is not None:
                emit(f"C_gather_{tag}_ms", round(ms, 3))

        # sort-by-(key,iota) then gather: the full alternative transport
        def argsort_gather_ms():
            kk = kf[:L] if "B" in phases else jnp.asarray(
                np.random.RandomState(1).randint(0, 2**30, size=L,
                                                 dtype=np.int32))
            iota = lax.broadcasted_iota(jnp.int32, (1, L), 1)[0]

            @jax.jit
            def do(s):
                sk, sp = lax.sort((kk + s.astype(jnp.int32), iota),
                                  num_keys=1, is_stable=False)
                return (sk,) + tuple(tab[i][sp] for i in range(5))
            return pipelined_ms(lambda s: do(jnp.float32(s)), iters=20)

        ms = timed("C[argsort+gather]", argsort_gather_ms)
        if ms is not None:
            emit("C_argsort_gather5_ms", round(ms, 3))

    # ---------- D: full-pipeline fps per tile shape + ablation ----------
    if "D" in phases:
        def C_(**kw):
            base = dict(chunk=256, power_impl="mxu",
                        scan_impl="matmul_block128", pack_records=True,
                        exact_cull=True)
            base.update(kw)
            return RasterConfig(**base)

        cands = {
            "fast16x16_k4": C_(tile_h=16, tile_w=16,
                               max_tiles_per_gaussian=4),
            "fast8x16_k6": C_(tile_h=8, tile_w=16, max_tiles_per_gaussian=6,
                              emit_enum_cap=24),
            "fast8x8_k8": C_(tile_h=8, tile_w=8, max_tiles_per_gaussian=8,
                             emit_enum_cap=32),
            "fast8x8_k8_vpu": C_(tile_h=8, tile_w=8,
                                 max_tiles_per_gaussian=8,
                                 emit_enum_cap=32, power_impl="vpu"),
            "fast8x16_k6_c128": C_(tile_h=8, tile_w=16,
                                   max_tiles_per_gaussian=6,
                                   emit_enum_cap=24, chunk=128,
                                   scan_impl="matmul_split3"),
            "fast16x16_k4_c128": C_(tile_h=16, tile_w=16,
                                    max_tiles_per_gaussian=4, chunk=128,
                                    scan_impl="matmul_split3"),
            "fast8x8_k8_c128": C_(tile_h=8, tile_w=8,
                                  max_tiles_per_gaussian=8,
                                  emit_enum_cap=32, chunk=128,
                                  scan_impl="matmul_split3"),
        }

        for name, cfg in cands.items():
            @jax.jit
            def full(s, cfg=cfg):
                out = render(cam, means + s, colors, opac, scales, quats,
                             config=cfg, method="pallas")
                return out.rgb, out.n_dropped_rect

            nd = timed(f"D[{name}] drops", lambda: int(jax.device_get(
                full(jnp.float32(0.0))[1])))
            if nd is None:
                continue
            if nd > 0:
                emit(f"D_{name}", {"dropped": nd, "disqualified": True})
                continue
            ms = timed(f"D[{name}]", pipelined_ms,
                       lambda s, full=full: full(s)[0], 20)
            if ms is not None:
                emit(f"D_{name}", {"ms": round(ms, 3),
                                   "fps": round(1e3 / ms, 1)})

    # ---------- E: depth A/B (VERDICT item 2) ----------
    if "E" in phases:
        fast = RasterConfig(tile_h=16, tile_w=16, chunk=256,
                            max_tiles_per_gaussian=4, power_impl="mxu",
                            scan_impl="matmul_block128", pack_records=True)
        exact = fast.replace(depth_mode="exact")
        base = RasterConfig(tile_h=16, tile_w=16, chunk=128,
                            max_tiles_per_gaussian=4)
        base_exact = base.replace(depth_mode="exact")

        imgs = {}
        for name, cfg in (("fast", fast), ("exact", exact), ("base", base),
                          ("base_exact", base_exact)):
            r = timed(f"E[{name}]", lambda cfg=cfg: np.asarray(
                jax.device_get(render(cam, means, colors, opac, scales,
                                      quats, config=cfg,
                                      method="pallas").rgb)))
            if r is not None:
                imgs[name] = r
        for a, b in (("fast", "exact"), ("fast", "base"),
                     ("exact", "base_exact"), ("base", "base_exact")):
            if a in imgs and b in imgs:
                d = np.abs(imgs[a] - imgs[b])
                emit(f"E_delta_{a}_vs_{b}", {
                    "max": float(d.max()), "mean": float(d.mean()),
                    "max_8bit": float(d.max() * 255),
                    "frac_gt_1q": float((d > 1 / 255).mean())})

        # tie-collision census: adjacent sorted pairs sharing a fused key
        # but with genuinely different f32 depths (the reordering freedom
        # quantized mode introduces vs exact mode)
        @jax.jit
        def ties():
            gh, gw = -(-h // 16), -(-w // 16)
            ntiles = gh * gw
            proj = project(means, scales, quats, cam)
            tile_key, _, _ = binning.emit_pairs(
                proj, 16, 16, gh, gw, 4, opacity=opac, enum_cap=16)
            depth = jnp.broadcast_to(proj.depth[None, :],
                                     (4, n)).reshape(-1)
            bz = depth_key_bits(ntiles)
            key = fuse_tile_depth_key(tile_key, depth, bz)
            sk, sd = lax.sort((key, depth), num_keys=2, is_stable=False)
            live = sk < (ntiles << bz)
            same_key = (sk[1:] == sk[:-1]) & live[1:]
            diff_depth = jnp.abs(sd[1:] - sd[:-1]) > 0
            return (jnp.sum(same_key.astype(jnp.int32)),
                    jnp.sum((same_key & diff_depth).astype(jnp.int32)),
                    jnp.sum(live.astype(jnp.int32)), bz)

        r = timed("E[ties]", lambda: tuple(
            int(x) for x in jax.device_get(ties())))
        if r is not None:
            emit("E_tie_census", {"same_key_adjacent": r[0],
                                  "same_key_diff_depth": r[1],
                                  "live_pairs": r[2], "bits_z": r[3]})

    print("PROBE_RESULT " + json.dumps(OUT), flush=True)


if __name__ == "__main__":
    main()
