"""Benchmark: render + backward + train-step throughput at 200k gaussians.

Emits the result as a JSON line, e.g.:
  {"metric": "render_fps_200k", "value": N, "unit": "fps", "vs_baseline": R,
   "bwd_ms": ..., "train_step_ms": ..., "train_it_s": ...,
   "rays_per_s": ..., "feature32_fps": ...}

Driver contract: the LAST JSON line printed is the authoritative result.
The (growing) result object is re-emitted after every completed phase so a
device wedge in a later phase can never erase completed measurements — a
parser must take the final line, not the first.

Headline semantics: `value`/`vs_baseline` are ALWAYS the exact per-frame
render — the same quantity as the reference's 800-FPS claim (one full
rasterize per frame, README.md:98). The cached-order playback loop
(ops/playback.py) is reported separately as `playback_fps` /
`playback_batch4_fps`, at the LARGEST resort interval m in {8, 4, 2}
whose in-bench image-delta gate passes: the worst-staleness frame of a
resort-every-m loop (cache from frame 0, rendered at frame m-1 of the
interactive orbit) must differ from the exact render of the same frame
by less than one 8-bit quantum (`playback_max_delta_8bit[m]` < 1.0). If
every interval fails, the deltas are reported and the playback fps
fields are withheld.

Baselines (BASELINE.md, /root/reference/README.md:90-98): ~800 FPS raw
render of a trained scene and ~50 train it/s WITH the rigidity loss on the
upstream author's unstated GPU. vs_baseline = our_fps / 800.

Timing is pipelined (issue all iters, block once): the axon tunnel's
block_until_ready on a single enqueued call returns before execution
finishes, so only sustained throughput is meaningful. Each call perturbs
an input so no caching layer (jit or transport) can replay a result.
"""

from __future__ import annotations

import json
import threading
import time

import numpy as np

from dynamic3dgaussians_tpu.utils.timing import pipelined_ms

# module-level result object: the BaseException handler at the bottom
# re-emits THIS (with an error field) so a late crash can never erase
# measurements that already landed (last-JSON-line-wins driver contract).
RESULT = {"metric": "render_fps_200k", "value": 0.0, "unit": "fps",
          "vs_baseline": 0.0}

PHASE_TIMEOUT_S = 900  # first compile of a big config is ~3-6 min; a hung
# compile/execution (observed: pathological Mosaic compiles and stale-
# session device wedges lasting hours) must not prevent the bench from
# emitting its JSON line. Signals cannot interrupt a blocked TPU call, so
# each phase runs in a worker thread and is abandoned on join-timeout; the
# process force-exits at the end so an abandoned thread cannot hang exit.


def timed_phase(name, fn, *args, **kw):
    """Run one bench phase in a worker thread; None if it times out."""
    box = {}

    def run():
        try:
            box["out"] = fn(*args, **kw)
        except Exception as e:  # noqa: BLE001 - report, keep bench alive
            box["err"] = repr(e)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(PHASE_TIMEOUT_S)
    if th.is_alive():
        print(f"# phase {name} still blocked after {PHASE_TIMEOUT_S}s "
              "(compile-service/device wedge) — abandoned", flush=True)
        return None
    if "err" in box:
        print(f"# phase {name} failed: {box['err']}", flush=True)
        return None
    return box.get("out")


def playback_diagnostics(jax, jnp, args, cam, cfg, result, emit, w, h, f):
    """Cached-order playback diagnostics (opt-in; measured 7x SLOWER than
    exact rendering on TPU and its staleness gate fails at the bench scene
    — see ops/playback.py and PROFILE.md). Never touches `value`.

    The batched-playback (vmap x4) probe was REMOVED (r5):
    vmap(render_playback) with a SHARED cache does not lower on compiled
    Mosaic (the batched record table lands in memory-space ANY with a
    non-trivial index map — ops/playback.py docstring), so on TPU it could
    only burn its phase budget on a guaranteed compile error."""
    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.ops.playback import (build_cache,
                                                     render_playback)
    from dynamic3dgaussians_tpu.ops.rasterize import render

    @jax.jit
    def keyframe(s):
        return build_cache(cam, args[0] + s, args[2], args[3], args[4],
                           config=cfg)

    @jax.jit
    def cached_frame(s, cache):
        return render_playback(cam, args[0] + s, args[1], args[2], args[3],
                               args[4], cache, config=cfg).rgb

    def playback_phase():
        cache = jax.block_until_ready(keyframe(np.float32(0.0)))
        ms_frame = pipelined_ms(lambda s: cached_frame(s, cache))
        ms_key = pipelined_ms(keyframe, iters=10)
        return ms_frame, ms_key

    # image-delta gate (computed IN the bench, on the bench scene): the
    # worst-staleness frame of a resort-every-m loop is frame m-1 rendered
    # through the frame-0 cache. Compare it against the exact render of
    # the same frame; playback fps is reported at the LARGEST resort
    # interval whose max per-pixel delta stays under one 8-bit quantum
    # (none if even m=2 fails).
    @jax.jit
    def _stale_delta(camk, cache):
        pb = render_playback(camk, args[0], args[1], args[2], args[3],
                             args[4], cache, config=cfg).rgb
        ex = render(camk, args[0], args[1], args[2], args[3], args[4],
                    config=cfg, method="pallas").rgb
        return jnp.max(jnp.abs(pb - ex)) * 255.0

    def cam_at(frames):
        w2ck = np.eye(4, dtype=np.float32)
        w2ck[2, 3] = 6.0
        w2ck[0, 3] = 0.01 * frames  # interactive orbit step/frame
        return make_camera(w, h,
                           [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], w2ck)

    def delta_gate():
        # ONE frame-0 cache (reuses the already-jitted keyframe program)
        # serves all three staleness probes
        cache = jax.block_until_ready(keyframe(np.float32(0.0)))
        return {m: float(jax.block_until_ready(
            _stale_delta(cam_at(m - 1), cache))) for m in (8, 4, 2)}

    out = timed_phase("playback", playback_phase)
    if out is None:
        return
    ms_frame, ms_key = out
    deltas = timed_phase("playback_delta_gate", delta_gate)
    m_ok = None
    if deltas is not None:
        result["playback_max_delta_8bit"] = {
            str(m): round(d, 4) for m, d in deltas.items()}
        for m in (8, 4, 2):
            if deltas[m] < 1.0:
                m_ok = m
                break
    result["playback_gate_pass"] = m_ok is not None
    result["playback_frame_ms"] = round(ms_frame, 3)
    result["playback_key_ms"] = round(ms_key, 3)
    if m_ok is not None:
        result["playback_resort_every"] = m_ok
        result["playback_fps"] = round(
            1e3 / (ms_frame + ms_key / m_ok), 2)
    emit(result)


def main():
    import jax
    import jax.numpy as jnp

    from dynamic3dgaussians_tpu.utils.compile_cache import enable as \
        enable_compile_cache
    enable_compile_cache()

    from dynamic3dgaussians_tpu.ops.camera import make_camera
    from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render

    import os
    # CPU smoke override (interpret-mode validation of the whole bench
    # path without the chip): D3G_BENCH_N=2000 D3G_BENCH_H=96 D3G_BENCH_W=128
    n = int(os.environ.get("D3G_BENCH_N", 200_000))
    h = int(os.environ.get("D3G_BENCH_H", 360))
    w = int(os.environ.get("D3G_BENCH_W", 640))
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
    # Two forward candidates are measured and the faster one wins (and is
    # used by every later phase): "fast" stacks the round-3 levers — MXU
    # bilinear power, packed-f16 sort transport, chunk-256 hierarchical
    # scan (all CPU-parity-validated; see tests/test_pallas.py) — on top of
    # the r2-proven "base" config. If a candidate's Mosaic compile fails or
    # wedges it is skipped, so the bench still lands a nonzero number.
    candidates = [
        # r5 cell-pipeline lever: power_impl="mxu_fused" precomputes
        # log2-opacity rows at table build and fuses the alpha clamps,
        # lane mask and alpha*T multiply into ~10 VPU ops/cell vs ~15
        # (raster_fwd.chunk_logalpha_fused; CPU parity 2e-6 in
        # tests/test_pallas.py::test_fused_op_candidate_parity).
        ("fast_fused", RasterConfig(tile_h=16, tile_w=16, chunk=256,
                                    max_tiles_per_gaussian=4,
                                    power_impl="mxu_fused",
                                    scan_impl="matmul_block128",
                                    pack_records=True)),
        # r5 structural lever: probes measured ~2 us of fixed cost per
        # kernel grid step (920 tile steps = ~1.8 ms of the 8.6 ms frame);
        # tile_batch=8 processes 8 tiles per step with all 8 head-chunk
        # DMAs issued at the top of the step (see raster_fwd._kernel).
        ("fast_tb8", RasterConfig(tile_h=16, tile_w=16, chunk=256,
                                  max_tiles_per_gaussian=4,
                                  power_impl="mxu",
                                  scan_impl="matmul_block128",
                                  pack_records=True, tile_batch=8)),
        ("fast", RasterConfig(tile_h=16, tile_w=16, chunk=256,
                              max_tiles_per_gaussian=4, power_impl="mxu",
                              scan_impl="matmul_block128",
                              pack_records=True)),
        # K=2 emission: exact_cull caps PASSING tiles, and the bench
        # scene's ~2.5 px splats mostly pass 1-2 tiles — halves the pair
        # sort vs K=4 IF lossless (the drop check below disqualifies it
        # the moment n_dropped_rect > 0, so it can never go lossy).
        # K=3 was probed on hardware (artifacts/k3_probe_r4.log): 7.96 ms
        # (125.6 fps) but 22,408 rect drops at this scene — lossy, so not
        # a candidate. K=4 is the minimal exact emission here; K=2 below
        # stays as the canary that the drop check keeps the headline
        # honest if the scene statistics ever change.
        ("fast_k2", RasterConfig(tile_h=16, tile_w=16, chunk=256,
                                 max_tiles_per_gaussian=2,
                                 power_impl="mxu",
                                 scan_impl="matmul_block128",
                                 pack_records=True)),
        ("base", RasterConfig(tile_h=16, tile_w=16, chunk=128,
                              max_tiles_per_gaussian=4)),
    ]

    # device-touching setup gets its own timeout: a dead/wedged tunnel can
    # block the very first transfer forever, and the driver contract
    # requires a JSON line no matter what
    args = timed_phase("setup", lambda: tuple(
        map(jnp.asarray, (means, colors, opac, scales, quats))))
    if args is None:
        RESULT["error"] = "device setup blocked"
        print(json.dumps(RESULT))
        return

    # ---- forward render fps ----
    def make_fwd(fcfg):
        @jax.jit
        def full(s):
            out = render(cam, args[0] + s, args[1], args[2], args[3],
                         args[4], config=fcfg, method="pallas")
            return out.rgb, out.n_dropped_rect

        return full, (lambda s: full(s)[0])

    cfg, fwd, fwd_ms = None, None, None
    wedged = False  # an abandoned candidate thread may still hold the
    # compile service / device and unwedge mid-measurement of a later
    # candidate; when that has happened, measure twice and take the min
    # (the second pipelined run is cheap — no recompile) and flag the line.
    for cname, ccfg in candidates:
        cfull, cfwd = make_fwd(ccfg)
        # losslessness check: a candidate whose K emission truncates pairs
        # renders a different image than the reference quantity — it must
        # never become the headline, however fast.
        nd = timed_phase(f"dropcheck[{cname}]",
                         lambda: int(cfull(np.float32(0.0))[1]))
        if nd is None:
            wedged = True
            RESULT["forward_candidate_wedged"] = cname
            continue
        if nd > 0:
            RESULT[f"render_{cname}_skipped_rect_drops"] = nd
            print(f"# forward[{cname}]: {nd} rect drops — disqualified",
                  flush=True)
            continue
        ms = timed_phase(f"forward[{cname}]", pipelined_ms, cfwd)
        if ms is None:
            wedged = True
            RESULT["forward_candidate_wedged"] = cname
            continue
        if wedged:
            ms2 = timed_phase(f"forward[{cname}]#2", pipelined_ms, cfwd)
            if ms2 is not None:
                ms = min(ms, ms2)
        RESULT[f"render_fps_{cname}"] = round(1e3 / ms, 2)
        print(f"# forward[{cname}]: {ms:.3f} ms", flush=True)
        if fwd_ms is None or ms < fwd_ms:
            cfg, fwd, fwd_ms = ccfg, cfwd, ms
    if fwd_ms is None:
        RESULT["error"] = "forward phase blocked"
        print(json.dumps(RESULT))
        return

    def emit(partial):
        """Re-emit the (growing) result line after every phase so a later
        wedge can never erase completed measurements."""
        print(json.dumps(partial), flush=True)

    fps = 1e3 / fwd_ms
    result = RESULT
    result.update({
        "value": round(fps, 2),
        "vs_baseline": round(fps / 800.0, 4),
        "rays_per_s": round(h * w * fps),
    })
    emit(result)

    # ---- playback fps (OPT-IN: D3G_BENCH_PLAYBACK=1) ----
    # The reference's own 800-FPS quantity is its visualizer loop over a
    # trained scene (visualize_org.py:46-65); ours is the cached-order
    # playback path (ops/playback.py) — key frame re-sorts, cached frames
    # render through the frozen order. On TPU this measured a 7x LOSS vs
    # just rendering exactly (60 ms/frame, r4) and its staleness gate
    # fails at the bench scene, so it is diagnostics-only and kept OUT of
    # the driver-facing JSON by default (VERDICT r4 item 7).
    if os.environ.get("D3G_BENCH_PLAYBACK"):
        playback_diagnostics(jax, jnp, args, cam, cfg, result, emit, w, h, f)

    # ---- forward + full backward (the grad-kernel metric) ----
    @jax.jit
    def fwdbwd(s):
        def loss(m, c, o, sc, q):
            out = render(cam, m, c, o, sc, q, config=cfg, method="pallas")
            return jnp.sum(out.rgb) + 0.1 * jnp.sum(out.depth)
        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            args[0] + s, args[1], args[2], args[3], args[4])

    fwdbwd_ms = timed_phase("fwd+bwd", pipelined_ms, fwdbwd, iters=20)
    bwd_ms = None if fwdbwd_ms is None else max(fwdbwd_ms - fwd_ms, 0.0)
    if bwd_ms is not None:
        result["bwd_ms"] = round(bwd_ms, 2)
        emit(result)

    # ---- full train step at 200k: render + im/seg losses + Adam ----
    from dynamic3dgaussians_tpu.models import gaussians as G
    from dynamic3dgaussians_tpu.train import optim
    from dynamic3dgaussians_tpu.train.config import RasterSettings, \
        TrainConfig
    from dynamic3dgaussians_tpu.train.trainer import make_train_step, \
        raster_config

    cap = G.round_capacity(n)
    pt = np.concatenate([means, colors,
                         (rng.uniform(size=(n, 1)) < 0.5).astype(np.float32)],
                        axis=-1)
    params, variables = G.init_params(pt, w2c[None], capacity=cap)
    tcfg = TrainConfig(capacity=cap, raster=RasterSettings(
        tile_h=16, tile_w=16, chunk=128, max_tiles_per_gaussian=4,
        pack_records=True))  # 16-bit sort transport (validated: identical
    # PSNR trajectory vs f32 on the synthetic fit; parity tests in
    # tests/test_pallas.py::test_pack_records_parity)
    step = make_train_step(tcfg, raster_config(tcfg))
    opt_state = optim.init(params)
    lrs = {k: jnp.float32(1e-4) for k in params}
    gt = {"camera": cam,
          "im": jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32),
          "seg": jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32),
          "cam_id": jnp.int32(0)}

    state = {"p": params, "o": opt_state, "v": variables}

    def train_call(s):
        p = dict(state["p"])
        p["means3D"] = p["means3D"] + s
        new_p, new_o, new_v, metrics = step(p, state["o"], state["v"], gt,
                                            lrs, True)
        return metrics["loss"]

    train_ms = timed_phase("train_step", pipelined_ms, train_call,
                           iters=20)
    if train_ms is not None:
        result["train_step_ms"] = round(train_ms, 2)
        result["train_it_s"] = round(1e3 / train_ms, 2)
        emit(result)

    # ---- 32-channel feature field through the same pass (CV = 40) ----
    feat = jnp.asarray(rng.uniform(0, 1, (n, 32)), jnp.float32)

    @jax.jit
    def fwd_feat(s):
        out = render(cam, args[0] + s, args[1], args[2], args[3], args[4],
                     extra_channels=feat, config=cfg, method="pallas")
        return out.rgb, out.extra

    feat_ms = timed_phase("feature32", pipelined_ms, fwd_feat, iters=15)
    if feat_ms is not None:
        result["feature32_fps"] = round(1e3 / feat_ms, 2)

    emit(result)


if __name__ == "__main__":
    import os
    try:
        main()
    except BaseException as e:  # noqa: BLE001 - the JSON line MUST land
        print(f"# bench aborted: {e!r}", flush=True)
        RESULT["error"] = repr(e)[:200]
        print(json.dumps(RESULT))  # keeps any phases that already landed
    # abandoned phase threads may be blocked inside the TPU runtime and
    # would hang normal interpreter shutdown; all results are printed.
    os._exit(0)
