"""Pure device-time measurement: chain R dependent reps inside ONE jit call.

Separates real device execution from any dispatch/relay overhead: a single
dispatch runs the op R times sequentially (data-dependent chain, no CSE),
so per-rep time = (t_chain - t_baseline) / R.

Usage: python tools/measure_chain.py
"""

from __future__ import annotations

import time

import numpy as np


def timed(fn, *args, iters=8):
    import jax
    out = fn(np.float32(0.0), *args)
    jax.block_until_ready(out)
    ts = []
    for i in range(iters):
        s = np.float32(1e-7 * (i + 1))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(s, *args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dynamic3dgaussians_tpu.utils.compile_cache import enable
    enable()

    R = 25
    rng = np.random.RandomState(0)
    n = 819_200

    tile = jnp.asarray(rng.randint(0, 920, n).astype(np.int32))
    depth = jnp.asarray(rng.uniform(1, 10, n).astype(np.float32))
    rows12 = tuple(jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
                   for _ in range(10))
    fused = jnp.asarray(((rng.randint(0, 920, n).astype(np.int64) << 22)
                         | rng.randint(0, 1 << 22, n)).astype(np.int32))

    def chain(body):
        def f(s, *args):
            def step(i, carry):
                return body(carry, s * (i + 1).astype(jnp.float32))
            return lax.fori_loop(0, R, step, args)
        return jax.jit(f)

    results = {}

    # baseline: chain overhead with a trivial op
    def triv(args, s):
        return (args[0] + s.astype(jnp.int32).astype(args[0].dtype),) \
            + args[1:]
    base = timed(chain(triv), tile, depth)
    results["baseline (trivial chain)"] = base

    def scramble(k, s):
        # flip low key bits per rep so an adaptive sort cannot exploit the
        # previous rep's order
        si = (s * 1e9).astype(jnp.int32) & 1023
        return k ^ si

    # 12-row 2-key sort (current fwd sort shape)
    def s12(args, s):
        t, d = args[0], args[1]
        out = lax.sort((scramble(t, s), d + s) + args[2:], num_keys=2,
                       is_stable=False)
        return out
    t = timed(chain(s12), tile, depth, *rows12)
    results["sort 2key+10rows f32"] = (t - base) / R

    # 8-row fused-key sort (packed design: key, pos, x, y, 4 packed rows)
    def s8(args, s):
        k = args[0]
        out = lax.sort((scramble(k, s),) + tuple(a + s for a in args[1:8]),
                       num_keys=1, is_stable=False)
        return (k,) + out[1:] + args[8:]
    t = timed(chain(s8), fused, *rows12)
    results["sort 1key(i32)+7rows f32"] = (t - base) / R

    # 5-row unsort shape (pos + 4 packed grad rows)
    def s5(args, s):
        k = args[0]
        out = lax.sort((scramble(k, s),) + tuple(a + s for a in args[1:5]),
                       num_keys=1, is_stable=False)
        return (k,) + out[1:] + args[5:]
    t = timed(chain(s5), fused, *rows12)
    results["sort 1key(i32)+4rows f32"] = (t - base) / R

    # current 11-row unsort shape
    def s11(args, s):
        k = args[0]
        out = lax.sort((scramble(k, s),) + tuple(a + s for a in args[1:11]),
                       num_keys=1, is_stable=False)
        return (k,) + out[1:] + args[11:]
    t = timed(chain(s11), fused, *rows12)
    results["sort 1key(i32)+10rows f32"] = (t - base) / R

    # ---- full render chain: true device frame time ----
    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render

    ng = 200_000
    means = jnp.asarray(rng.uniform(-2, 2, (ng, 3)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (ng, 3)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.5, .99, ng).astype(np.float32))
    scales = jnp.asarray(rng.uniform(.004, .015, (ng, 3)).astype(np.float32))
    quats = rng.normal(size=(ng, 4)).astype(np.float32)
    quats = jnp.asarray(quats / np.linalg.norm(quats, axis=-1,
                                               keepdims=True))
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 6.0
    cam = make_camera(640, 360, [[500, 0, 320], [0, 500, 180], [0, 0, 1]],
                      w2c)
    cfg = RasterConfig(tile_h=16, tile_w=16, chunk=128,
                       max_tiles_per_gaussian=4)
    RR = 10

    @jax.jit
    def frame_chain(s):
        def step(i, m):
            out = render(cam, m, colors, opac, scales, quats, config=cfg,
                         method="pallas")
            return m + (out.rgb.mean() * 0 + s) * 1e-12
        return lax.fori_loop(0, RR, step, means)

    def fc(s):
        return frame_chain(s)
    t_f = timed(fc)
    t_triv = base * RR / R  # approx trivial chain scaled
    results[f"full render frame (chain/{RR})"] = (t_f - t_triv) / RR

    for k, v in results.items():
        print(f"{k}: {v:.3f} ms")


if __name__ == "__main__":
    main()
