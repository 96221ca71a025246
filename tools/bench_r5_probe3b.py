"""Round-5 probe #3b: minimal tile_batch hardware pricing.

Trimmed from bench_r5_probe3.py after the first attempt was starved by
host-core contention (single host CPU — see .claude/skills/verify): only
the decision-critical programs ride, in cache-friendly order (the tb8/tb1
configs are EXACTLY bench.py's fast_tb8/fast candidates, so bench.py
cache-hits everything this probe compiles):

  1. fps + image, tile_batch=1  (the r4 shipping config — control)
  2. fps + image, tile_batch=8  (the r5 candidate) + parity vs tb1
  3. affine-key quantized cull on/off image delta (item-2 closure)
  4. fwd+bwd with tile_batch=8 forward (training-path effect)

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
           python tools/bench_r5_probe3b.py > artifacts/r5_probe3b.log
"""

from __future__ import annotations

import json
import threading

import numpy as np

PHASE_TIMEOUT_S = 800
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

    def mk(tb, **kw):
        return RasterConfig(tile_h=16, tile_w=16, chunk=256,
                            max_tiles_per_gaussian=4, power_impl="mxu",
                            scan_impl="matmul_block128",
                            pack_records=True, tile_batch=tb, **kw)

    def make_full(cfg):
        @jax.jit
        def full(s):
            out = render(cam, means + s, colors, opac, scales, quats,
                         config=cfg, method="pallas")
            return out.rgb, out.n_dropped_rect
        return full

    imgs = {}
    for name, cfg in (("tb1", mk(1)), ("tb8", mk(8)),
                      ("tb8_nocull", mk(8, exact_cull=False))):
        full = make_full(cfg)
        r = timed(f"img[{name}]", lambda full=full: np.asarray(
            jax.device_get(full(jnp.float32(0.0))[0])))
        if r is None:
            continue
        imgs[name] = r
        if name != "tb8_nocull":  # fps only where it informs the decision
            ms = timed(f"fps[{name}]", pipelined_ms,
                       lambda s, full=full: full(s)[0], 20)
            if ms is not None:
                emit(f"fps_{name}", {"ms": round(ms, 3),
                                     "fps": round(1e3 / ms, 1)})

    if "tb1" in imgs and "tb8" in imgs:
        d = np.abs(imgs["tb8"] - imgs["tb1"])
        emit("parity_tb8_vs_tb1", {"max": float(d.max()),
                                   "max_8bit": float(d.max() * 255)})
    if "tb8" in imgs and "tb8_nocull" in imgs:
        d = np.abs(imgs["tb8"] - imgs["tb8_nocull"])
        emit("affine_cull_on_off", {"max": float(d.max()),
                                    "max_8bit": float(d.max() * 255),
                                    "frac_gt_1q": float((d > 1/255).mean())})

    @jax.jit
    def fwdbwd(s, cfg=mk(8)):
        def loss(m):
            out = render(cam, m, colors, opac, scales, quats, config=cfg,
                         method="pallas")
            return jnp.sum(out.rgb) + 0.1 * jnp.sum(out.depth)
        return jax.grad(loss)(means + s)

    ms = timed("fwdbwd[tb8]", pipelined_ms, fwdbwd, 15)
    if ms is not None:
        emit("fwdbwd_tb8_ms", round(ms, 3))

    print("PROBE3B_RESULT " + json.dumps(OUT), flush=True)


if __name__ == "__main__":
    import os
    main()
    os._exit(0)  # abandoned phase threads must not hang exit
