"""Bisect the train-step device hang at bench shapes (verbose staging)."""

from __future__ import annotations

import sys
import time

import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main(n):
    import jax
    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    enable()
    from dynamic3dgaussians_tpu.models import gaussians as G
    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.train import optim
    from dynamic3dgaussians_tpu.train.config import RasterSettings, \
        TrainConfig
    from dynamic3dgaussians_tpu.train.trainer import make_train_step, \
        raster_config

    h, w = 360, 640
    rng = np.random.RandomState(0)
    means = rng.uniform(-2.0, 2.0, (n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 6.0
    cam = make_camera(w, h, [[500, 0, w / 2], [0, 500, h / 2], [0, 0, 1]],
                      w2c)
    cap = G.round_capacity(n)
    pt = np.concatenate([means, colors,
                         (rng.uniform(size=(n, 1)) < 0.5).astype(np.float32)],
                        axis=-1)
    log(f"init params n={n} cap={cap}")
    params, variables = G.init_params(pt, w2c[None], capacity=cap)
    tcfg = TrainConfig(capacity=cap, raster=RasterSettings(
        tile_h=16, tile_w=16, chunk=128, max_tiles_per_gaussian=4))
    step = make_train_step(tcfg, raster_config(tcfg))
    opt_state = optim.init(params)
    lrs = {k: jnp.float32(1e-4) for k in params}
    gt = {"camera": cam,
          "im": jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32),
          "seg": jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32),
          "cam_id": jnp.int32(0)}
    log("calling train step (warmup: trace+compile+execute)...")
    t0 = time.time()
    out = step(params, opt_state, variables, gt, lrs, True)
    log(f"dispatched in {time.time() - t0:.1f}s; blocking...")
    t0 = time.time()
    jax.block_until_ready(out)
    log(f"executed in {time.time() - t0:.1f}s; "
        f"loss={float(out[3]['loss']):.4f}")
    for i in range(3):
        t0 = time.time()
        p2 = dict(params)
        p2["means3D"] = p2["means3D"] + np.float32(1e-7 * (i + 1))
        out = step(p2, opt_state, variables, gt, lrs, True)
        jax.block_until_ready(out)
        log(f"iter {i}: {time.time() - t0:.3f}s "
            f"loss={float(out[3]['loss']):.4f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
