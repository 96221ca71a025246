"""Round-3 perf variants: full-pipeline fps per RasterConfig candidate.

Measures the COMPLETE render (the honest bench quantity) under each
candidate configuration, pipelined with perturbed inputs (PROFILE.md
methodology), plus a one-frame numeric diff vs the baseline config and the
emission drop count — so a speedup that silently changes the image or
truncates pairs is visible immediately.

Each variant compiles its own XLA program (~2.5-5 min cold); a hung Mosaic
compile is abandoned via a worker-thread timeout (bench.py pattern) so the
rest of the sweep still reports.

Usage: PYTHONPATH=/root/repo python tools/bench_r3_variants.py [names...]
"""

from __future__ import annotations

import sys
import threading

import numpy as np

VARIANT_TIMEOUT_S = 900


def timed(name, fn, *a, **k):
    box = {}

    def run():
        try:
            box["out"] = fn(*a, **k)
        except Exception as e:  # noqa: BLE001
            box["err"] = repr(e)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(VARIANT_TIMEOUT_S)
    if th.is_alive():
        print(f"# {name}: blocked > {VARIANT_TIMEOUT_S}s — abandoned",
              flush=True)
        return None
    if "err" in box:
        print(f"# {name}: failed: {box['err']}", flush=True)
        return None
    return box.get("out")


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

    def C(**kw):
        base = dict(tile_h=16, tile_w=16, chunk=128,
                    max_tiles_per_gaussian=4, exact_cull=False)
        base.update(kw)
        return RasterConfig(**base)

    variants = {
        "base_r2": C(),
        "cull": C(exact_cull=True),
        "cull_mxu": C(exact_cull=True, power_impl="mxu"),
        "cull_pack": C(exact_cull=True, pack_records=True),
        "cull_mxu_c256_pack": C(exact_cull=True, power_impl="mxu",
                                chunk=256, pack_records=True),
        # bench.py's "fast" candidate, verbatim (block-128 hierarchical
        # scan on the 256 chunk) — the sweep result validates the bench's
        # default choice directly.
        "fast_bench": C(exact_cull=True, power_impl="mxu", chunk=256,
                        pack_records=True, scan_impl="matmul_block128"),
        "cull_pack_k2": C(exact_cull=True, pack_records=True,
                          max_tiles_per_gaussian=2),
        "cull_mxu_pack_k2": C(exact_cull=True, power_impl="mxu",
                              pack_records=True, max_tiles_per_gaussian=2),
    }
    names = sys.argv[1:] or list(variants)

    ref_rgb = {}

    def run_variant(name):
        cfg = variants[name]

        @jax.jit
        def fwd(s):
            out = render(cam, means + s, colors, opac, scales, quats,
                         config=cfg, method="pallas")
            return out.rgb, out.n_dropped_rect

        rgb, nd = fwd(np.float32(0.0))
        rgb = np.asarray(rgb)
        nd = int(nd)
        if name == "base_r2":
            ref_rgb["base"] = rgb
        if "base" in ref_rgb:
            dmax = float(np.max(np.abs(rgb - ref_rgb["base"])))
        else:
            dmax = float("nan")  # base_r2 not run/failed: diffs unanchored
        ms = pipelined_ms(lambda s: fwd(s)[0])
        return ms, nd, dmax

    for name in names:
        out = timed(name, run_variant, name)
        if out is None:
            continue
        ms, nd, dmax = out
        print(f"{name}: {ms:.3f} ms ({1e3 / ms:.1f} fps)  "
              f"n_dropped_rect={nd}  max|rgb-base|={dmax:.2e}", flush=True)

    # ---- microprobes deciding round-3 design questions ----
    def probe_gather():
        """Row-gather cost at playback-cache shapes: (200k, 16) table
        gathered by 800k pair indices. Decides whether a cached-permutation
        playback mode (sort every M frames, gather-apply in between) can
        beat re-sorting."""
        table = jnp.asarray(rng.uniform(size=(n, 16)).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, n, size=(4 * n,)).astype(np.int32))

        @jax.jit
        def g(s):
            return jnp.sum(table[idx] + s)
        g(np.float32(0.0)).block_until_ready()
        return pipelined_ms(g)

    def probe_sort_len():
        """lax.sort cost vs length at 10 payload rows (K=2 hypothesis)."""
        outs = {}
        for ln in (400_000, 800_000):
            key = jnp.asarray(rng.randint(0, 1 << 30, size=(ln,)
                                          ).astype(np.int32))
            rows = tuple(jnp.asarray(rng.uniform(size=(ln,)
                                                 ).astype(np.float32))
                         for _ in range(9))

            @jax.jit
            def s(d, key=key, rows=rows):
                out = jax.lax.sort((key + d,) + rows, num_keys=1,
                                   is_stable=False)
                return out[0][0] + out[1][0]
            s(jnp.int32(0)).block_until_ready()
            outs[ln] = pipelined_ms(lambda d: s(jnp.int32(d)))
        return outs

    def _playback_fns(cfg):
        from dynamic3dgaussians_tpu.ops.playback import (build_cache,
                                                         render_playback)

        @jax.jit
        def key(s):
            return build_cache(cam, means + s, opac, scales, quats,
                               config=cfg)

        @jax.jit
        def frame(s, cache):
            return render_playback(cam, means + s, colors, opac, scales,
                                   quats, cache, config=cfg).rgb

        return key, frame, render_playback

    playback_state = {}

    def probe_playback():
        """Cached-order playback (ops/playback.py) at the bench shape:
        per-frame ms of a cached frame + key-frame (emission + key/pos
        sort) ms. Amortized fps at resort-every-M = 1e3/(frame + key/M).
        The batched form is its own probe (own timeout budget) so a slow
        batch4 compile cannot discard these already-measured numbers."""
        cfg = C(exact_cull=True)
        key, frame, _ = _playback_fns(cfg)
        cache = jax.block_until_ready(key(np.float32(0.0)))
        ms_frame = pipelined_ms(lambda s: frame(s, cache))
        ms_key = pipelined_ms(key, iters=10)
        playback_state["key_ms"] = ms_key
        return {"frame_ms": round(ms_frame, 3), "key_ms": round(ms_key, 3),
                "fps_resort8": round(1e3 / (ms_frame + ms_key / 8), 1)}

    def probe_playback_batch4():
        """4 cached playback frames per dispatch (orbit steps around the
        key camera) — the max-throughput visualizer loop."""
        from tools.bench_common import orbit4_cameras
        cfg = C(exact_cull=True)
        key, _, render_playback = _playback_fns(cfg)
        bc = orbit4_cameras(w, h, 500.0)

        @jax.jit
        def frames4(s, cache):
            return jax.vmap(lambda c: render_playback(
                c, means + s, colors, opac, scales, quats, cache,
                config=cfg).rgb)(bc)

        cache = jax.block_until_ready(key(np.float32(0.0)))
        ms_b4 = pipelined_ms(lambda s: frames4(s, cache), iters=15) / 4.0
        res = {"batch4_frame_ms": round(ms_b4, 3)}
        ms_key = playback_state.get("key_ms")
        if ms_key is not None:
            res["batch4_fps_resort8"] = round(1e3 / (ms_b4 + ms_key / 8), 1)
        return res

    def probe_batch4():
        """vmap the exact render over 4 cameras: one XLA program overlaps
        frame A's kernel with frame B's sort. Per-frame ms."""
        from tools.bench_common import orbit4_cameras
        cfg = C(exact_cull=True)
        bc = orbit4_cameras(w, h, 500.0, dx=0.02)

        @jax.jit
        def fb(s):
            return jax.vmap(lambda c: render(
                c, means + s, colors, opac, scales, quats, config=cfg,
                method="pallas").rgb)(bc)

        return pipelined_ms(fb, iters=15) / 4.0

    def probe_train(power, unsort="sort"):
        """Full train step (render fwd+bwd + im/seg losses + Adam) at the
        bench shape with packed transport; decides bench.py's train
        config (vpu vs mxu backward)."""
        from dynamic3dgaussians_tpu.models import gaussians as G
        from dynamic3dgaussians_tpu.train import optim
        from dynamic3dgaussians_tpu.train.config import (RasterSettings,
                                                         TrainConfig)
        from dynamic3dgaussians_tpu.train.trainer import (make_train_step,
                                                          raster_config)
        cap = G.round_capacity(n)
        w2c0 = np.eye(4, dtype=np.float32)
        w2c0[2, 3] = 6.0
        pt = np.concatenate(
            [np.asarray(means), np.asarray(colors),
             (rng.uniform(size=(n, 1)) < 0.5).astype(np.float32)], axis=-1)
        params, variables = G.init_params(pt, w2c0[None], capacity=cap)
        tcfg = TrainConfig(capacity=cap, raster=RasterSettings(
            tile_h=16, tile_w=16, chunk=128, max_tiles_per_gaussian=4,
            pack_records=True, power_impl=power, unsort_impl=unsort))
        step = make_train_step(tcfg, raster_config(tcfg))
        opt_state = optim.init(params)
        lrs = {k: jnp.float32(1e-4) for k in params}
        gt = {"camera": cam,
              "im": jnp.asarray(rng.uniform(0, 1, (h, w, 3)), np.float32),
              "seg": jnp.asarray(rng.uniform(0, 1, (h, w, 3)), np.float32),
              "cam_id": jnp.int32(0)}

        def call(s):
            p = dict(params)
            p["means3D"] = p["means3D"] + s
            _, _, _, m = step(p, opt_state, variables, gt, lrs, True)
            return m["loss"]

        return pipelined_ms(call, iters=20)

    for pname, pfn in [("playback", probe_playback),
                       ("playback_batch4", probe_playback_batch4),
                       ("batch4_per_frame_ms", probe_batch4),
                       ("train_pack_vpu_ms", lambda: probe_train("vpu")),
                       ("train_pack_mxu_ms", lambda: probe_train("mxu")),
                       ("train_pack_mxu_gather_ms",
                        lambda: probe_train("mxu", "gather")),
                       ("gather_800k_rows16", probe_gather),
                       ("sort_len_scaling", probe_sort_len)]:
        out = timed(pname, pfn)
        if out is not None:
            print(f"probe {pname}: {out}", flush=True)


if __name__ == "__main__":
    main()
