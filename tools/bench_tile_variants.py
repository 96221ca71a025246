"""A/B full forward frame across (tile, chunk, K) configs on TPU."""

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
    # (tile_h, tile_w, chunk, K)
    for th, tw, ck, k in [(16, 16, 128, 4), (16, 16, 256, 4),
                          (16, 32, 128, 4), (16, 32, 256, 4),
                          (8, 128, 128, 4)]:
        cfg = RasterConfig(tile_h=th, tile_w=tw, chunk=ck,
                           max_tiles_per_gaussian=k)

        @jax.jit
        def f(s, cfg=cfg):
            out = render(cam, means + s, colors, opac, scales, quats,
                         config=cfg, method="pallas")
            return out.rgb, out.n_dropped_rect

        try:
            ms = pipelined_ms(f)
            rgb, drop = f(np.float32(0.0))
            rgb = np.asarray(rgb)
            if ref is None:
                ref = rgb
            err = float(np.abs(rgb - ref).max())
            print(f"tile {th}x{tw} chunk {ck} K {k}: {ms:.3f} ms "
                  f"({1e3 / ms:.1f} fps) drop={int(drop)} "
                  f"max|d|={err:.1e}", flush=True)
        except Exception as e:
            print(f"tile {th}x{tw} chunk {ck} K {k}: FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
