"""Benchmark: render throughput at 200k gaussians on the available device.

Prints ONE JSON line:
  {"metric": "render_fps_200k", "value": N, "unit": "fps", "vs_baseline": R}

Baseline: the upstream reference README claims ~800 FPS raw render of a
trained dynamic scene on its (unstated) single GPU (/root/reference/
README.md:98, BASELINE.md). vs_baseline = our_fps / 800.

Each timed call perturbs one input so no caching layer (jit or transport)
can replay a previous result.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.utils.compile_cache import enable as \
        enable_compile_cache
    enable_compile_cache()

    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render

    n = 200_000
    h, w = 360, 640
    rng = np.random.RandomState(0)
    # trained-scene-like statistics: small, mostly-opaque gaussians
    means = rng.uniform(-2.0, 2.0, (n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.5, 0.99, (n,)).astype(np.float32)
    scales = rng.uniform(0.004, 0.015, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)

    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 6.0
    f = 500.0
    cam = make_camera(w, h, [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], w2c)
    # K=4 emission is lossless for this scene (n_dropped_rect == 0 and the
    # image is bit-identical to K=16) and cuts the pair sort nearly in half.
    cfg = RasterConfig(tile_h=16, tile_w=16, chunk=128,
                       max_tiles_per_gaussian=4)

    args = tuple(map(jnp.asarray, (means, colors, opac, scales, quats)))

    @jax.jit
    def fwd(s):
        return render(cam, args[0] + s, args[1], args[2], args[3], args[4],
                      config=cfg, method="pallas").rgb

    fwd(jnp.float32(0.0)).block_until_ready()  # compile + warmup

    iters = 30
    t0 = time.perf_counter()
    outs = [fwd(jnp.float32(1e-7 * (i + 1))) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    fps = iters / dt
    print(json.dumps({
        "metric": "render_fps_200k",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 800.0, 4),
    }))


if __name__ == "__main__":
    main()
