"""Per-timestep dynamic training driver (the reference's canonical L3 loop).

Mirrors the call stack of SURVEY.md §3.1 (train_beffor.py:275-339):

  train(dataset, cfg)
    initialize_params -> capacity-padded tables (models.gaussians)
    for t in timesteps:
      if t > 0: initialize_per_timestep   (forward extrapolation + freezes)
      for i in iters:
        train_step (jit): render RGB+seg in ONE pass, losses, Adam
        densify at the reference cadence (t == 0 only)
      params2cpu -> stacked output
      if t == 0: initialize_post_first_timestep (compaction + 20-NN graph)

TPU-first differences from the reference:
  * RGB and segmentation composite in a single render (no 2x second pass).
  * The whole step (render fwd+bwd + all losses + Adam) is one jitted XLA
    program; the rigidity family runs masked at full capacity (the part the
    upstream README measured ~20x faster compiled, README.md:90-92).
  * Densification mutates masks/slots, not shapes; the table is compacted
    once after t0, then topology is frozen (matching the reference, which
    densifies only in the first timestep, train_beffor.py:314-315).
  * Multiple cameras can be batched per step (`cams_per_step`) — the same
    axis parallel.camera_dp shards over devices.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamic3dgaussians_tpu.models import gaussians as G
from dynamic3dgaussians_tpu.ops import quat
from dynamic3dgaussians_tpu.ops.knn import knn
from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render
from dynamic3dgaussians_tpu.train import densify as densify_mod
from dynamic3dgaussians_tpu.train import losses as L
from dynamic3dgaussians_tpu.train import optim
from dynamic3dgaussians_tpu.train.config import TrainConfig


def raster_config(cfg: TrainConfig) -> RasterConfig:
    r = cfg.raster
    return RasterConfig(tile_h=r.tile_h, tile_w=r.tile_w, chunk=r.chunk,
                        max_per_tile=r.max_per_tile,
                        max_tiles_per_gaussian=r.max_tiles_per_gaussian,
                        pairs_per_gaussian=r.pairs_per_gaussian,
                        exact_cull=r.exact_cull, power_impl=r.power_impl,
                        scan_impl=r.scan_impl,
                        pack_records=r.pack_records,
                        unsort_impl=r.unsort_impl)


def densify_with_growth(densify_jit, params, variables, opt_state, i, sub,
                        cfg: TrainConfig):
    """One densify pass with unbounded growth (external.py:244-292 appends
    freely): if the pass ran out of free slots, grow the capacity table
    host-side and redo the pass on the pre-densify state — zero rows are
    ever dropped. densify_jit does not donate its inputs, so the pre-pass
    state is still live for the redo. Returns the densify_jit 4-tuple."""
    new_state = densify_jit(params, variables, opt_state, jnp.int32(i), sub)
    dropped = int(new_state[3].n_dropped_capacity)
    if dropped > 0 and cfg.grow_capacity:
        cap = variables["alive"].shape[0]
        needed = int(new_state[3].n_alive) + dropped
        new_cap = G.round_capacity(max(2 * cap, needed))
        if cfg.max_capacity:
            new_cap = min(new_cap, G.round_capacity(cfg.max_capacity))
        if new_cap > cap:
            params, variables, opt_state = G.grow_capacity(
                params, variables, new_cap, opt_state)
            new_state = densify_jit(params, variables, opt_state,
                                    jnp.int32(i), sub)
    return new_state


def compute_loss(params: Dict, probe: jnp.ndarray, batch: Dict,
                 variables: Dict, *, is_initial: bool, cfg: TrainConfig,
                 rcfg: RasterConfig):
    """Loss over one camera datapoint (vmapped over a camera batch upstream).

    batch: {camera: Camera, im (H,W,3), seg (H,W,3), cam_id (), has_depth?,
    gt_depth (H,W)}. Returns (loss, aux) with radii for densification stats.
    """
    alive = variables["alive"]
    act = G.activated(params, alive)
    # RGB + seg (+ semantic features) composite in ONE pass; the reference
    # pays a second full render for seg (README.md:88-89) and a third config
    # for the 32-ch feature field (dyn_train.py:244).
    extra = params["seg_colors"]
    has_feat = "gt_feature" in batch and "semantic_feature" in params
    if has_feat:
        extra = jnp.concatenate([extra, params["semantic_feature"]], axis=-1)
    out = render(batch["camera"], act["means3d"], act["colors"],
                 act["opacity"], act["scales"], act["rotations"],
                 extra_channels=extra,
                 mean2d_probe_ndc=probe, config=rcfg,
                 method=cfg.raster.method)

    cam_id = batch["cam_id"]
    im = L.apply_cam_correction(out.rgb, params["cam_m"][cam_id],
                                params["cam_c"][cam_id])
    losses = {"im": L.image_loss(im, batch["im"]),
              "seg": L.image_loss(out.extra[..., :3], batch["seg"])}
    if "gt_depth" in batch:
        losses["depth"] = L.depth_pearson_loss(out.depth, batch["gt_depth"])
    if has_feat:
        # feature-field loss: bilinear-resize the rendered map to the GT
        # feature map and 0.8*L1 + 0.2*DSSIM (sanity_feature.py:442,487)
        feat = out.extra[..., 3:]
        gt_feat = batch["gt_feature"]
        if feat.shape[:2] != gt_feat.shape[:2]:
            feat = jax.image.resize(feat, gt_feat.shape[:2]
                                    + feat.shape[2:], "bilinear")
        losses["feature"] = L.image_loss(feat, gt_feat)
    if not is_initial:
        is_fg = params["seg_colors"][:, 0] > 0.5
        losses.update(L.physics_losses(
            act["means3d"], act["rotations"], params["rgb_colors"],
            variables, is_fg, alive))

    w = cfg.loss_weights
    total = sum(jnp.float32(w.get(k, 0.0)) * v for k, v in losses.items())
    aux = {"losses": losses, "radii": out.radii,
           "psnr": L.psnr(jnp.clip(im, 0, 1), batch["im"]),
           "n_dropped": (out.n_dropped_capacity + out.n_dropped_rect
                         + out.n_dropped_tile_overflow),
           "n_dropped_rect": out.n_dropped_rect}
    return total, aux


def make_train_step(cfg: TrainConfig, rcfg: RasterConfig):
    """Build the jitted train step: grads over (params, probe) + Adam."""

    def batched_loss(params, probe, batch, variables, is_initial):
        f = functools.partial(compute_loss, is_initial=is_initial, cfg=cfg,
                              rcfg=rcfg)
        if batch["cam_id"].ndim == 0:
            return f(params, probe, batch, variables)
        losses, auxs = jax.vmap(
            lambda b: f(params, probe, b, variables))(batch)
        aux = {"losses": jax.tree.map(jnp.mean, auxs["losses"]),
               "radii": jnp.max(auxs["radii"], axis=0),
               "psnr": jnp.mean(auxs["psnr"]),
               "n_dropped": jnp.sum(auxs["n_dropped"]),
               "n_dropped_rect": jnp.sum(auxs["n_dropped_rect"])}
        return jnp.mean(losses), aux

    def step_core(params, opt_state, variables, batch, lrs,
                  is_initial: bool):
        probe = jnp.zeros((variables["alive"].shape[0], 2), jnp.float32)
        (loss, aux), (gp, gprobe) = jax.value_and_grad(
            batched_loss, argnums=(0, 1), has_aux=True)(
                params, probe, batch, variables, is_initial)
        # Dead capacity slots must not drift (and their grads can be NaN
        # through e.g. normalize-at-zero): hard-mask them every step.
        alive = variables["alive"]
        gp = {k: (v if k in G.CAMERA_KEYS else jnp.where(
            alive.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0))
            for k, v in gp.items()}
        new_params, new_opt = optim.step(params, gp, opt_state, lrs)
        new_vars = densify_mod.accumulate_stats(variables, gprobe,
                                                aux["radii"])
        metrics = {"loss": loss, "psnr": aux["psnr"],
                   "n_dropped": aux["n_dropped"],
                   "n_dropped_rect": aux["n_dropped_rect"], **{
                       f"loss_{k}": v for k, v in aux["losses"].items()}}
        return new_params, new_opt, new_vars, metrics

    # NOTE: no donate_argnums — params/moments are small next to the
    # rendering activations, and donation deletes caller-held buffers
    # (checkpoint saves are async; users naturally reuse params).
    train_step = functools.partial(jax.jit, static_argnames=(
        "is_initial",))(step_core)
    train_step._step_core = step_core  # reused by make_train_scan
    return train_step


def make_train_scan(cfg: TrainConfig, rcfg: RasterConfig,
                    train_step=None):
    """Build the ON-DEVICE multi-step window: lax.scan over K train steps.

    VERDICT r4 item 3: the reference's ~50 it/s is its *loop* rate
    (train_beffor.py's tqdm), but a host-dispatched per-step loop through
    the axon relay pays ~100+ ms of per-call latency — 8x the 21 ms step.
    Scanning K steps inside ONE jitted program amortizes dispatch to
    <1 ms/step: the camera data for the whole timestep lives on device
    (`data_stack`, stacked over cameras) and each scan step gathers its
    camera batch by index, so the host touches nothing between windows.

    Args/returns of the jitted callable:
      (params, opt_state, variables, data_stack, cam_sel, lrs, is_initial)
        -> (params, opt_state, variables, metrics)
      cam_sel: (n_steps,) or (n_steps, k_cams) int32 camera indices into
        data_stack's leading axis. Distinct n_steps values compile
        distinct programs — callers should use a fixed window size.
      metrics: last-step values, except n_dropped/n_dropped_rect which are
        SUMS over the window (the trainer's K-escalation check must see a
        drop on ANY step, not just the last).
    """
    core = (train_step or make_train_step(cfg, rcfg))._step_core

    @functools.partial(jax.jit, static_argnames=("is_initial",))
    def train_scan(params, opt_state, variables, data_stack, cam_sel, lrs,
                   is_initial: bool):
        def body(carry, sel):
            p, o, v = carry
            batch = jax.tree.map(lambda x: x[sel], data_stack)
            p, o, v, m = core(p, o, v, batch, lrs, is_initial)
            return (p, o, v), m

        (p, o, v), ms = jax.lax.scan(body, (params, opt_state, variables),
                                     cam_sel)
        metrics = {k: (jnp.sum(v) if k in ("n_dropped", "n_dropped_rect")
                       else v[-1]) for k, v in ms.items()}
        return p, o, v, metrics

    return train_scan


def stack_timestep_data(data_t: List[Dict]):
    """Stack one timestep's camera datapoints into a device-resident pytree
    (leading axis = camera) for make_train_scan's indexed gathers."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *data_t)


def window_from_variables(variables: Dict):
    """Reassemble the WindowPlan stored by initialize_post_first_timestep
    (None when the locality reorder / windowed fetch is disabled)."""
    if "win_start" not in variables:
        return None
    from dynamic3dgaussians_tpu.ops.neighbor import WindowPlan
    return WindowPlan(variables["win_start"], variables["win_idx_local"],
                      variables["win_lanes"], variables["win_spill_row"],
                      variables["win_spill_k"], variables["win_spill_src"])


def initialize_per_timestep(params: Dict, variables: Dict,
                            opt_state: optim.AdamState):
    """Forward-extrapolation init + previous-state caching (t > 0).

    Reference train_beffor.py:220-240: new_x = x + (x - prev_x); cache
    prev_inv_rot (conjugate for fg), prev_offset, prev colors/points/rots;
    Adam moments reset for the re-initialized tensors.
    """
    from dynamic3dgaussians_tpu.ops.neighbor import (EdgeReduction,
                                                     lookup_components)
    pts = params["means3D"]
    rot = quat.normalize(params["unnorm_rotations"])
    new_pts = pts + (pts - variables["prev_pts"])
    new_rot = quat.normalize(rot + (rot - variables["prev_rot"]))

    idx = variables["neighbor_indices"]
    plan = EdgeReduction(variables["edge_rank"], variables["edge_row_ptr"], 0)
    nx, ny, nz = lookup_components((pts[:, 0], pts[:, 1], pts[:, 2]), idx,
                                   plan, window=window_from_variables(
                                       variables))
    # previous-frame neighbor offsets, feature-major (3, K, cap)
    prev_offset = jnp.stack([nx - pts[None, :, 0], ny - pts[None, :, 1],
                             nz - pts[None, :, 2]], axis=0)

    # variables may alias params' buffers freely: train_step does NOT
    # donate its inputs (see the no-donate note on make_train_step), and
    # JAX arrays are immutable, so no defensive copies are needed. If
    # donation is ever enabled, XLA will error on the doubly-donated
    # aliased buffers rather than corrupt them.
    new_vars = dict(variables)
    new_vars["prev_inv_rot"] = quat.conjugate(rot)
    new_vars["prev_offset"] = prev_offset
    new_vars["prev_col"] = params["rgb_colors"]
    new_vars["prev_pts"] = new_pts
    new_vars["prev_rot"] = new_rot

    new_params = dict(params)
    new_params["means3D"] = new_pts
    new_params["unnorm_rotations"] = new_rot
    opt_state = optim.reset_moments(opt_state, "means3D")
    opt_state = optim.reset_moments(opt_state, "unnorm_rotations")
    return new_params, new_vars, opt_state


def initialize_post_first_timestep(params: Dict, variables: Dict,
                                   cfg: TrainConfig, opt_state=None):
    """Build the foreground 20-NN graph and freeze the t0-only state.

    Reference train_beffor.py:243-263. The kNN runs on-device over the
    capacity-padded table masked to alive foreground slots; indices are
    global slot ids (-1 for non-fg rows), so no fg compaction is needed.

    When `opt_state` is given the table is additionally row-reordered ONCE
    (reverse Cuthill-McKee over the fg subgraph, FOREGROUND ROWS FIRST)
    and the edge plan is restricted to that prefix: the physics-loss
    neighbor fetch — whose fwd gather + bwd rank-sort IS essentially the
    whole t>0 physics cost on TPU (artifacts/neighbor_window_probe.log) —
    then rides n_fg*K edge slots instead of cap*K (2.6x fewer at the
    131k-cap/49k-fg probe scale). cfg.neighbor_window additionally stores
    a WindowPlan for the one-hot MXU fetch variant (opt-in; measured
    slower than the prefix gather).

    Returns (params, variables, opt_state).
    """
    alive = variables["alive"]
    is_fg = (params["seg_colors"][:, 0] > 0.5) & alive
    if cfg.knn_method == "approx":
        from dynamic3dgaussians_tpu.ops.knn import knn_approx
        sq_dist, idx = knn_approx(params["means3D"], cfg.num_knn, mask=is_fg)
    else:
        sq_dist, idx = knn(params["means3D"], cfg.num_knn, mask=is_fg)
    sq_dist = jnp.where(idx >= 0, sq_dist, 0.0)

    new_vars = dict(variables)
    n_dst = None
    if opt_state is not None:
        from dynamic3dgaussians_tpu.ops.neighbor import (build_window_plan,
                                                         locality_order)
        cap = int(alive.shape[0])
        idx_h = np.asarray(idx)
        fg_rows = np.flatnonzero(np.asarray(is_fg))
        if fg_rows.size:
            perm = locality_order(idx_h, fg_rows, cap)
            inv = np.empty(cap, np.int64)
            inv[perm] = np.arange(cap)
            porder = jnp.asarray(perm)
            params = {k: (v if k in G.CAMERA_KEYS else v[porder])
                      for k, v in params.items()}
            for k in ("alive", "means2D_gradient_accum", "denom",
                      "max_2D_radius"):
                new_vars[k] = new_vars[k][porder]
            opt_state = optim.AdamState(
                mu={k: (v if k in G.CAMERA_KEYS else v[porder])
                    for k, v in opt_state.mu.items()},
                nu={k: (v if k in G.CAMERA_KEYS else v[porder])
                    for k, v in opt_state.nu.items()},
                step=opt_state.step)
            idx_h = np.where(idx_h[perm] >= 0,
                             inv[np.maximum(idx_h[perm], 0)],
                             -1).astype(np.int32)
            idx = jnp.asarray(idx_h)
            sq_dist = sq_dist[porder]
            n_dst = int(fg_rows.size)      # fg prefix carries all edges now
            if getattr(cfg, "neighbor_window", False):
                # windowed one-hot MXU fetch — exact but measured SLOWER
                # than the prefix gather on hardware (artifacts/
                # neighbor_window_probe.log: 21.3 vs 14.2 ms fwd, and the
                # prefix plan cuts the gather another 2.6x) — kept opt-in
                window = build_window_plan(idx_h, n_dst)
                new_vars["win_start"] = window.win_start
                new_vars["win_idx_local"] = window.idx_local
                new_vars["win_lanes"] = window.lanes
                new_vars["win_spill_row"] = window.spill_row
                new_vars["win_spill_k"] = window.spill_k
                new_vars["win_spill_src"] = window.spill_src

    # static backward plan for the fixed graph (sort-based edge reduction,
    # restricted to the fg prefix when the reorder ran)
    from dynamic3dgaussians_tpu.ops.neighbor import build_edge_reduction
    plan = build_edge_reduction(np.asarray(idx), n_dst=n_dst)

    new_vars["neighbor_indices"] = idx
    new_vars["edge_rank"] = plan.rank
    new_vars["edge_row_ptr"] = plan.row_ptr
    new_vars["neighbor_weight"] = jnp.exp(-cfg.knn_weight_beta * sq_dist)
    new_vars["neighbor_dist"] = jnp.sqrt(sq_dist)
    rot = quat.normalize(params["unnorm_rotations"])
    # aliasing params is fine — no donation; see initialize_per_timestep
    new_vars["init_bg_pts"] = params["means3D"]
    new_vars["init_bg_rot"] = rot
    new_vars["prev_pts"] = params["means3D"]
    new_vars["prev_rot"] = rot
    return params, new_vars, opt_state


def params_to_cpu(params: Dict, variables: Dict, is_initial: bool) -> Dict:
    """Strip capacity padding and pull to host (reference params2cpu)."""
    n = int(G.num_alive(variables))
    keys = params.keys() if is_initial else ("means3D", "rgb_colors",
                                             "unnorm_rotations")
    out = {}
    for k in keys:
        v = np.asarray(params[k])
        out[k] = v if k in G.CAMERA_KEYS else v[:n]
    return out


def train(dataset: List[List[Dict]], cfg: TrainConfig,
          pt_cld: np.ndarray, w2c_stack: np.ndarray,
          callbacks: Optional[Dict] = None,
          checkpoint_dir: Optional[str] = None,
          checkpoint_every: int = 0,
          resume: bool = False):
    """Full dynamic-sequence optimization.

    Args:
      dataset: dataset[t] = list of camera datapoints (dicts as in
        compute_loss) for timestep t — either a materialized list or a
        callable `t -> frames` for lazy/streamed loading (pair it with
        native.FileLoader prefetching so disk IO overlaps device steps).
      cfg: TrainConfig.
      pt_cld: (N, 7) initial point cloud [xyz, rgb, seg].
      w2c_stack: (C, 4, 4) t=0 camera extrinsics (scene radius estimate).
      checkpoint_dir/checkpoint_every: orbax full-state checkpoints every K
        iterations (0 = off); `resume` restarts from the latest one
        (crash-recovery; SURVEY.md §5.3/§5.4).

    Returns:
      (output_params, params, variables): the stacked per-timestep host
      checkpoints plus final device state.
    """
    callbacks = callbacks or {}
    rng = np.random.RandomState(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)

    params, variables = G.init_params(
        pt_cld, w2c_stack, capacity=cfg.capacity or
        G.round_capacity(pt_cld.shape[0] * 4),
        semantic_dim=cfg.semantic_dim)
    opt_state = optim.init(params)
    rcfg = raster_config(cfg)
    train_step = make_train_step(cfg, rcfg)
    densify_jit = jax.jit(densify_mod.densify)

    ckpt_mgr = None
    resume_t, resume_i, global_step = -1, -1, 0
    if checkpoint_dir:
        from dynamic3dgaussians_tpu.train.checkpoint import CheckpointManager
        ckpt_mgr = CheckpointManager(checkpoint_dir)
        if resume:
            restored = ckpt_mgr.load()
            if restored is not None:
                global_step, params, opt_state, variables, cursor = restored
                resume_t, resume_i = cursor["t"], cursor["i"]

    def lr_tree(frozen: bool):
        lrs = {}
        for k in params:
            base = cfg.lrs.get(k, 0.0)
            if k == "means3D":
                base = base * float(variables["scene_radius"])
            if frozen and k in cfg.freeze_after_t0:
                base = 0.0
            lrs[k] = jnp.float32(base)
        return lrs

    get_t = dataset if callable(dataset) else dataset.__getitem__
    output_params = []
    for t in range(cfg.num_timesteps):
        is_initial = t == 0
        if t < resume_t:
            continue  # resumed past this timestep (output_params of skipped
            # timesteps must be rebuilt from the npz checkpoint by the caller)
        data_t = get_t(t)
        if not is_initial and t != resume_t:
            params, variables, opt_state = initialize_per_timestep(
                params, variables, opt_state)
        num_iters = (cfg.iters_first_timestep if is_initial
                     else cfg.iters_per_timestep)
        lrs = lr_tree(frozen=not is_initial)
        todo: List[int] = []
        start_i = resume_i + 1 if t == resume_t else 0
        k_cams = max(1, min(cfg.cams_per_step, len(data_t)))
        # lazy on-device accumulator (no per-step host sync): truncation on
        # the 99 non-report steps must still be visible at report time
        # (advisor r3: sampling only the report step can hide intermittent
        # K-cap overflow indefinitely)
        rect_drop_accum = jnp.int32(0)

        # On-device multi-step windows (steps_per_call > 1): scan exactly
        # `scan_w` steps per dispatch wherever no host action (densify,
        # opacity reset, report, checkpoint) falls strictly inside the
        # window; single steps cover boundaries and remainders. Amortizes
        # per-dispatch relay latency (VERDICT r4 item 3).
        scan_w = max(1, int(cfg.steps_per_call))
        use_scan = scan_w > 1 and len(data_t) > 0
        if use_scan:
            train_scan = make_train_scan(cfg, rcfg, train_step)
            data_stack = stack_timestep_data(data_t)

        def pick_cams(n_steps):
            """(n_steps, k_cams) indices from the without-replacement
            permutation stream (reference get_batch semantics)."""
            nonlocal todo
            rows = []
            for _ in range(n_steps):
                row = []
                for _ in range(k_cams):
                    if not todo:
                        todo = list(rng.permutation(len(data_t)))
                    row.append(int(todo.pop()))
                rows.append(row)
            return np.asarray(rows, np.int32)

        def next_mult(x, m):
            return ((x + m - 1) // m) * m

        def next_host_action(i):
            """Smallest step index >= i after which the host must act."""
            a = [num_iters - 1, next_mult(i, cfg.report_every)]
            if is_initial and i <= cfg.densify_end:
                d = next_mult(max(i, cfg.densify_start), cfg.densify_every)
                if d <= cfg.densify_end:
                    a.append(d)
                a.append(next_mult(max(i, 1), cfg.opacity_reset_every))
            if ckpt_mgr and checkpoint_every:
                a.append(i + (-(global_step + 1)) % checkpoint_every)
            return min(x for x in a if x >= i)

        i = start_i
        while i < num_iters:
            span = next_host_action(i) - i + 1
            if use_scan and span >= scan_w:
                sel = pick_cams(scan_w)
                sel_dev = jnp.asarray(sel[:, 0] if k_cams == 1 else sel)
                params, opt_state, variables, metrics = train_scan(
                    params, opt_state, variables, data_stack, sel_dev,
                    lrs, is_initial)
                steps_done = scan_w
            else:
                # random camera(s) without replacement (reference
                # get_batch); cams_per_step > 1 stacks a camera batch
                # (vmapped in the step)
                picks = [data_t[c] for c in pick_cams(1)[0]]
                if k_cams == 1:
                    batch = picks[0]
                else:
                    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *picks)
                params, opt_state, variables, metrics = train_step(
                    params, opt_state, variables, batch, lrs, is_initial)
                steps_done = 1
            if cfg.grow_tiles and "n_dropped_rect" in metrics:
                # scan windows return the SUM over their steps
                rect_drop_accum = rect_drop_accum + jnp.asarray(
                    metrics["n_dropped_rect"], jnp.int32)
            global_step += steps_done
            i = i + steps_done - 1  # index of the last executed step
            if ckpt_mgr and checkpoint_every and \
                    global_step % checkpoint_every == 0:
                ckpt_mgr.save(global_step, params, opt_state, variables,
                              {"t": t, "i": i})
            if is_initial and i <= cfg.densify_end:
                if i >= cfg.densify_start and i % cfg.densify_every == 0:
                    key, sub = jax.random.split(key)
                    params, variables, opt_state, dstats = \
                        densify_with_growth(densify_jit, params, variables,
                                            opt_state, i, sub, cfg)
                    if "on_densify" in callbacks:
                        callbacks["on_densify"](t, i, dstats)
                if i > 0 and i % cfg.opacity_reset_every == 0:
                    params, opt_state = densify_mod.reset_opacity(params,
                                                                  opt_state)
            if i % cfg.report_every == 0:
                # Rect-cap escalation: the CUDA reference never truncates a
                # gaussian's tile rect (forward.cu:246-250); if the K
                # emission slots overflowed on ANY step since the last
                # report (accumulated on-device above), double K and rebuild
                # the step (recompile amortized, same pattern as capacity
                # growth) so no gradient systematically misses coverage.
                if (cfg.grow_tiles
                        and int(rect_drop_accum) > 0
                        and cfg.raster.max_tiles_per_gaussian < 64):
                    import dataclasses as _dc
                    new_k = min(cfg.raster.max_tiles_per_gaussian * 2, 64)
                    # grow the tiled-path pair budget WITH K: on the CPU
                    # oracle pair_capacity = pairs_per_gaussian * N, so an
                    # escalation that only raised K would shift truncation
                    # from counted rect drops to capacity drops instead of
                    # eliminating it (pallas emission capacity is K*N
                    # directly and ignores pairs_per_gaussian)
                    new_pairs = (min(new_k, cfg.pairs_budget_cap)
                                 if cfg.pairs_budget_cap else new_k)
                    new_pairs = max(cfg.raster.pairs_per_gaussian,
                                    new_pairs)
                    # non-destructive: never mutate the caller's TrainConfig
                    cfg = _dc.replace(cfg, raster=_dc.replace(
                        cfg.raster, max_tiles_per_gaussian=new_k,
                        pairs_per_gaussian=new_pairs))
                    rcfg = raster_config(cfg)
                    train_step = make_train_step(cfg, rcfg)
                    if use_scan:
                        train_scan = make_train_scan(cfg, rcfg, train_step)
                    if "on_grow_tiles" in callbacks:
                        callbacks["on_grow_tiles"](t, i, new_k)
                rect_drop_accum = jnp.int32(0)
                if "on_step" in callbacks:
                    callbacks["on_step"](t, i, metrics)
            i += 1

        if is_initial:
            # Repack alive slots to the front so the neighbor graph and the
            # stacked checkpoints stay contiguous; topology is frozen now.
            params, variables, opt_state, _ = G.compact_with_optimizer(
                params, variables, opt_state)
            params, variables, opt_state = initialize_post_first_timestep(
                params, variables, cfg, opt_state)
        output_params.append(params_to_cpu(params, variables, is_initial))
        if "on_timestep" in callbacks:
            callbacks["on_timestep"](t, params, variables)
    if ckpt_mgr:
        ckpt_mgr.save(global_step + 1, params, opt_state, variables,
                      {"t": cfg.num_timesteps - 1, "i": num_iters}, wait=True)
        ckpt_mgr.close()
    return output_params, params, variables
