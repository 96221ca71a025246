"""Round-5 probe #2: chunk-size scaling + early-termination census.

Probe #1 (artifacts/r5_probe.log) showed the forward kernel is dominated
by PER-CHUNK ITERATION OVERHEAD (~1.5-2 us/chunk: DMA issue/wait +
while_loop control), not cell math: 8x8 tiles with 2.5x fewer live cells
measured 1.8x SLOWER because they schedule 2.4x more chunks. The lever is
therefore FEWER, BIGGER chunks: at 16x16 tiles the mean tile holds ~394
live pairs, so chunk=512 makes most tiles a single iteration.

  F. full-pipeline fps at 16x16 K4 for chunk in {256, 384, 512, 768, 1024}
     (scan_impl matmul_block128 handles any multiple of 128),
  G. early-termination census: scheduled chunks vs chunks actually
     processed (n_active) at the bench scene — prices the while_loop's
     per-iteration T-death check and bounds what early-exit is worth.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
           python tools/bench_r5_probe2.py [F G] > artifacts/r5_probe2.log
"""

from __future__ import annotations

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

    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    enable()
    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
    from dynamic3dgaussians_tpu.utils.timing import pipelined_ms

    phases = set(sys.argv[1:]) or {"F", "E2", "G"}

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

    def C_(**kw):
        base = dict(tile_h=16, tile_w=16, max_tiles_per_gaussian=4,
                    power_impl="mxu", scan_impl="matmul_block128",
                    pack_records=True, exact_cull=True)
        base.update(kw)
        return RasterConfig(**base)

    if "F" in phases:
        for chunk in (256, 384, 512, 768, 1024):
            cfg = C_(chunk=chunk)

            @jax.jit
            def full(s, cfg=cfg):
                out = render(cam, means + s, colors, opac, scales, quats,
                             config=cfg, method="pallas")
                return out.rgb, out.n_dropped_rect

            nd = timed(f"F[c{chunk}] drops", lambda: int(jax.device_get(
                full(jnp.float32(0.0))[1])))
            if nd is None or nd > 0:
                emit(f"F_chunk{chunk}", {"dropped": nd})
                continue
            ms = timed(f"F[c{chunk}]", pipelined_ms,
                       lambda s, full=full: full(s)[0], 20)
            if ms is not None:
                emit(f"F_chunk{chunk}", {"ms": round(ms, 3),
                                         "fps": round(1e3 / ms, 1)})

    if "E2" in phases:
        # VERDICT item 2, second half: the r4 sweep's 0.18 RGB delta
        # appears with exact_cull ALONE (variants_r04.txt: "cull" vs
        # "base_r2") — the cull changes emission-slot order, and the
        # num_keys=1 fused-key sort breaks same-depth-bucket ties by slot
        # order. depth_mode="total" adds the f32 depth as a secondary key
        # (CUDA-reference total order); under it the cull must be order-
        # neutral. Measured here: the on/off deltas under both modes, the
        # quantized-tie deviation vs the canonical total-order image, and
        # the fps cost of the total-order headline candidate.
        def mk(**kw):
            base = dict(tile_h=16, tile_w=16, chunk=256,
                        max_tiles_per_gaussian=4, power_impl="mxu",
                        scan_impl="matmul_block128", pack_records=True)
            base.update(kw)
            return RasterConfig(**base)

        e2 = {
            "cull_q": mk(),
            "nocull_q": mk(exact_cull=False),
            "cull_total": mk(depth_mode="total"),
            "nocull_total": mk(exact_cull=False, depth_mode="total"),
        }
        imgs = {}
        for name, cfg in e2.items():
            r = timed(f"E2[{name}]", lambda cfg=cfg: np.asarray(
                jax.device_get(render(cam, means, colors, opac, scales,
                                      quats, config=cfg,
                                      method="pallas").rgb)))
            if r is not None:
                imgs[name] = r
        for a, b in (("cull_q", "nocull_q"), ("cull_total", "nocull_total"),
                     ("cull_q", "cull_total"), ("nocull_q", "cull_total")):
            if a in imgs and b in imgs:
                d = np.abs(imgs[a] - imgs[b])
                emit(f"E2_delta_{a}_vs_{b}", {
                    "max": float(d.max()), "mean": float(d.mean()),
                    "max_8bit": float(d.max() * 255),
                    "frac_gt_1q": float((d > 1 / 255).mean())})

        cfg_t = e2["cull_total"]

        @jax.jit
        def full_t(s):
            return render(cam, means + s, colors, opac, scales, quats,
                          config=cfg_t, method="pallas").rgb

        ms = timed("E2[fps_total]", pipelined_ms, full_t, 20)
        if ms is not None:
            emit("E2_fps_total", {"ms": round(ms, 3),
                                  "fps": round(1e3 / ms, 1)})

    if "G" in phases:
        # how many chunks does the kernel ACTUALLY run (early termination)
        # vs schedule? run the inner pallas composite directly.
        from dynamic3dgaussians_tpu.ops import binning
        from dynamic3dgaussians_tpu.ops.pallas.raster_fwd import \
            pallas_composite_tiles
        from dynamic3dgaussians_tpu.ops.projection import project
        from dynamic3dgaussians_tpu.ops.sorted_raster import (
            GEOM_ROWS, depth_key_bits, fuse_tile_depth_key)
        from jax import lax

        def census(chunk):
            gh, gw = -(-h // 16), -(-w // 16)
            ntiles = gh * gw

            @jax.jit
            def go():
                proj = project(means, scales, quats, cam)
                tile_key, _, _ = binning.emit_pairs(
                    proj, 16, 16, gh, gw, 4, opacity=opac, enum_cap=16)
                depth = jnp.broadcast_to(proj.depth[None, :],
                                         (4, n)).reshape(-1)
                bz = depth_key_bits(ntiles)
                key = fuse_tile_depth_key(tile_key, depth, bz)

                def bcast(v):
                    return jnp.broadcast_to(v[None, :], (4, n)).reshape(-1)
                log2e = jnp.float32(1.4426950408889634)
                rows = [bcast(proj.x2d), bcast(proj.y2d),
                        bcast(proj.conic_a * log2e),
                        bcast(proj.conic_b * log2e),
                        bcast(proj.conic_c * log2e), bcast(opac)]
                rows += [bcast(colors.T[c]) for c in range(3)]
                s = lax.sort((key,) + tuple(rows), num_keys=1,
                             is_stable=False)
                sk, payload = s[0], s[1:]
                sd = jnp.ones_like(sk, jnp.float32)
                bounds = jnp.searchsorted(
                    sk, (jnp.arange(ntiles + 1, dtype=jnp.int32) << bz),
                    side="left").astype(jnp.int32)
                starts, counts = bounds[:-1], bounds[1:] - bounds[:-1]
                ne = sk.shape[0]
                ne_pad = (-(-ne // chunk) + 1) * chunk
                pad = ne_pad - ne
                rws = list(payload[:6])
                rws += [jnp.zeros_like(sd)] * (GEOM_ROWS - 6)
                rws += list(payload[6:]) + [sd, jnp.ones_like(sd)]
                rws += [jnp.zeros_like(sd)] * 3          # pad CV to 8
                rec_t = jnp.pad(jnp.stack(rws, 0), ((0, 0), (0, pad)))
                _, _, n_active = pallas_composite_tiles(
                    rec_t, starts, counts, num_tiles=ntiles, grid_w=gw,
                    tile_h=16, tile_w=16, chunk=chunk,
                    scan_impl="matmul_block128" if chunk > 128
                    else "matmul_split3")
                shift = starts - (starts // chunk) * chunk
                sched = jnp.where(counts == 0, 0,
                                  (shift + counts + chunk - 1) // chunk)
                return (jnp.sum(n_active), jnp.sum(sched),
                        jnp.sum((counts > 0).astype(jnp.int32)))
            act, sched, nonempty = (int(x) for x in jax.device_get(go()))
            return {"chunks_active": act, "chunks_sched": sched,
                    "tiles_nonempty": nonempty}

        for chunk in (128, 256, 512):
            r = timed(f"G[c{chunk}]", census, chunk)
            if r is not None:
                emit(f"G_census_c{chunk}", r)

    print("PROBE2_RESULT " + json.dumps(OUT), flush=True)


if __name__ == "__main__":
    main()
