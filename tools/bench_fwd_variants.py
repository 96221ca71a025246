"""A/B the forward frame across kernel precision / chunk variants (TPU)."""

from __future__ import annotations

import time

import numpy as np


from dynamic3dgaussians_tpu.utils.timing import pipelined_ms


def main():
    import jax
    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    enable()
    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render

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

    ref = None
    for prec, chunk in [("highest", 128), ("high", 128), ("high", 256),
                        ("highest", 256)]:
        cfg = RasterConfig(tile_h=16, tile_w=16, chunk=chunk,
                           max_tiles_per_gaussian=4, kernel_precision=prec)

        @jax.jit
        def f(s, cfg=cfg):
            return render(cam, means + s, colors, opac, scales, quats,
                          config=cfg, method="pallas").rgb

        ms = pipelined_ms(f)
        out = np.asarray(f(np.float32(0.0)))
        if ref is None:
            ref = out
        err = float(np.abs(out - ref).max())
        print(f"prec={prec} chunk={chunk}: {ms:.3f} ms "
              f"({1e3 / ms:.1f} fps), max|d| vs highest/128 = {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
