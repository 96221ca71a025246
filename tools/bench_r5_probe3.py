"""Round-5 probe #3: tile_batch (multi-tile grid steps + head-chunk
prefetch) on hardware — fps and bit-parity vs tile_batch=1.

Probe #1/#2 localized ~2 us of fixed cost per forward-kernel grid step
(920 steps = ~1.8 ms of the 5.4 ms kernel); raster_fwd._kernel now
processes `tile_batch` tiles per step and DMAs every tile's first chunk
at the top of the step. Interpret-mode parity is bitwise (committed
check); this probe prices it on Mosaic and re-checks parity on hardware.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
           python tools/bench_r5_probe3.py > artifacts/r5_probe3.log
"""

from __future__ import annotations

import json
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

    def mk(tb, depth_mode="quantized", chunk=256):
        return RasterConfig(tile_h=16, tile_w=16, chunk=chunk,
                            max_tiles_per_gaussian=4, power_impl="mxu",
                            scan_impl="matmul_block128" if chunk > 128
                            else "matmul_split3",
                            pack_records=True, depth_mode=depth_mode,
                            tile_batch=tb)

    ref_img = None
    for tb in (1, 2, 4, 8):
        for mode in (("quantized",) if tb != 4 else ("quantized", "total")):
            cfg = mk(tb, mode)

            @jax.jit
            def full(s, cfg=cfg):
                out = render(cam, means + s, colors, opac, scales, quats,
                             config=cfg, method="pallas")
                return out.rgb, out.n_dropped_rect

            r = timed(f"img[tb{tb},{mode}]", lambda: np.asarray(
                jax.device_get(full(jnp.float32(0.0))[0])))
            if r is None:
                continue
            if tb == 1 and mode == "quantized":
                ref_img = r
            elif ref_img is not None and mode == "quantized":
                emit(f"parity_tb{tb}",
                     {"max_vs_tb1": float(np.abs(r - ref_img).max())})
            ms = timed(f"fps[tb{tb},{mode}]", pipelined_ms,
                       lambda s, full=full: full(s)[0], 20)
            if ms is not None:
                emit(f"fps_tb{tb}_{mode}", {"ms": round(ms, 3),
                                            "fps": round(1e3 / ms, 1)})

    # affine depth keys (now default in _prepare): cull on/off must agree
    # to ~noise under plain quantized mode — the cheap item-2 closure
    @jax.jit
    def img_of(s, cfg):
        return render(cam, means + s, colors, opac, scales, quats,
                      config=cfg, method="pallas").rgb

    a_on = timed("affine[cull]", lambda: np.asarray(jax.device_get(
        img_of(jnp.float32(0.0), mk(4)))))
    a_off = timed("affine[nocull]", lambda: np.asarray(jax.device_get(
        img_of(jnp.float32(0.0), mk(4).replace(exact_cull=False)))))
    a_tot = timed("affine[total]", lambda: np.asarray(jax.device_get(
        img_of(jnp.float32(0.0), mk(4, "total")))))
    if a_on is not None and a_off is not None:
        d = np.abs(a_on - a_off)
        emit("affine_cull_on_off", {"max": float(d.max()),
                                    "max_8bit": float(d.max() * 255),
                                    "frac_gt_1q": float((d > 1/255).mean())})
    if a_on is not None and a_tot is not None:
        d = np.abs(a_on - a_tot)
        emit("affine_q_vs_total", {"max": float(d.max()),
                                   "max_8bit": float(d.max() * 255),
                                   "frac_gt_1q": float((d > 1/255).mean())})

    # 4-tile batch at chunk 128 (fewer masked lanes, overhead now amortized)
    cfg = mk(4, "quantized", chunk=128)

    @jax.jit
    def full_c128(s):
        return render(cam, means + s, colors, opac, scales, quats,
                      config=cfg, method="pallas").rgb

    ms = timed("fps[tb4,c128]", pipelined_ms, full_c128, 20)
    if ms is not None:
        emit("fps_tb4_c128", {"ms": round(ms, 3), "fps": round(1e3 / ms, 1)})

    # full train step with tile_batch=4 (the kernel change must also pay in
    # the training pipeline; bwd kernel unchanged)
    @jax.jit
    def fwdbwd(s, cfg=mk(4, "total")):
        def loss(m):
            out = render(cam, m, colors, opac, scales, quats, config=cfg,
                         method="pallas")
            return jnp.sum(out.rgb) + 0.1 * jnp.sum(out.depth)
        return jax.grad(loss)(means + s)

    ms = timed("fwdbwd[tb4,total]", pipelined_ms, fwdbwd, 15)
    if ms is not None:
        emit("fwdbwd_tb4_total_ms", round(ms, 3))

    print("PROBE3_RESULT " + json.dumps(OUT), flush=True)


if __name__ == "__main__":
    main()
