"""Ablation attribution of the TRAIN-side costs at the bench shape.

Stages (all pipelined, cut off progressively):
  fwd_train    render primal as the vjp fwd runs it (sort WITH pos row)
  bwd_kernel   + the reverse-walk Pallas kernel (no unsort)
  bwd_full     + unsort + K-reduce (= full render vjp via jax.grad)
  loss_grad    full loss (im L1+DSSIM + seg) gradient, no Adam
  train_step   + Adam + stats (= the bench train metric)
"""

from __future__ import annotations

import numpy as np

from dynamic3dgaussians_tpu.utils.timing import pipelined_ms


def main():
    import jax
    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    enable()
    from dynamic3dgaussians_tpu.models import gaussians as G
    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
    from dynamic3dgaussians_tpu.train import optim
    from dynamic3dgaussians_tpu.train.config import RasterSettings, \
        TrainConfig
    from dynamic3dgaussians_tpu.train.trainer import make_train_step, \
        raster_config

    n, h, w = 200_000, 360, 640
    rng = np.random.RandomState(0)
    means = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = jnp.asarray(rng.uniform(0.5, 0.99, (n,)).astype(np.float32))
    scales = jnp.asarray(rng.uniform(.004, .015, (n, 3)).astype(np.float32))
    q = rng.normal(size=(n, 4)).astype(np.float32)
    quats = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))
    meansj = jnp.asarray(means)
    colorsj = jnp.asarray(colors)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 6.0
    cam = make_camera(w, h, [[500, 0, w / 2], [0, 500, h / 2], [0, 0, 1]],
                      w2c)
    cfg = RasterConfig(tile_h=16, tile_w=16, chunk=128,
                       max_tiles_per_gaussian=4)

    results = {}

    # fwd as the vjp runs it: jax.vjp primal (sort WITH pos)
    @jax.jit
    def fwd_train(s):
        out, _ = jax.vjp(
            lambda m: render(cam, m, colorsj, opac, scales, quats,
                             config=cfg, method="pallas").rgb, meansj + s)
        return out
    results["fwd_train (vjp primal)"] = pipelined_ms(fwd_train)

    # full render grad wrt means only
    @jax.jit
    def g_means(s):
        return jax.grad(lambda m: jnp.sum(render(
            cam, m, colorsj, opac, scales, quats, config=cfg,
            method="pallas").rgb))(meansj + s)
    results["render grad (means only)"] = pipelined_ms(g_means, iters=20)

    # full render grad wrt all five
    @jax.jit
    def g_all(s):
        def loss(m, c, o, sc, qq):
            out = render(cam, m, c, o, sc, qq, config=cfg, method="pallas")
            return jnp.sum(out.rgb) + 0.1 * jnp.sum(out.depth)
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            meansj + s, colorsj, opac, scales, quats)
    results["render grad (5-way)"] = pipelined_ms(g_all, iters=20)

    # loss-level gradient: L1 + DSSIM + seg render channels
    from dynamic3dgaussians_tpu.ops.ssim import calc_ssim
    gt_im = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    gt_seg = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    seg_cols = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)

    @jax.jit
    def g_loss(s):
        def loss(m):
            out = render(cam, m, colorsj, opac, scales, quats,
                         extra_channels=seg_cols, config=cfg,
                         method="pallas")
            im = jnp.clip(out.rgb, 0, 1)
            l = 0.8 * jnp.mean(jnp.abs(im - gt_im)) + \
                0.2 * (1 - calc_ssim(im, gt_im))
            l += 0.8 * jnp.mean(jnp.abs(out.extra - gt_seg))
            return l
        return jax.grad(loss)(meansj + s)
    results["loss grad (im+ssim+seg)"] = pipelined_ms(g_loss, iters=20)

    # the bench train step
    cap = G.round_capacity(n)
    pt = np.concatenate([means, colors,
                         (rng.uniform(size=(n, 1)) < 0.5).astype(np.float32)],
                        axis=-1)
    params, variables = G.init_params(pt, w2c[None], capacity=cap)
    tcfg = TrainConfig(capacity=cap, raster=RasterSettings(
        tile_h=16, tile_w=16, chunk=128, max_tiles_per_gaussian=4))
    step = make_train_step(tcfg, raster_config(tcfg))
    opt_state = optim.init(params)
    lrs = {k: jnp.float32(1e-4) for k in params}
    gt = {"camera": cam, "im": gt_im, "seg": gt_seg, "cam_id": jnp.int32(0)}

    def train_call(s):
        p = dict(params)
        p["means3D"] = p["means3D"] + s
        return step(p, opt_state, variables, gt, lrs, True)[3]["loss"]
    results["train step"] = pipelined_ms(train_call, iters=20)

    for k, v in results.items():
        print(f"{k}: {v:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
