"""Pallas TPU backward compositing kernel (the N4 renderCUDA<3> equivalent).

Computes per-pair gradients of the tile compositing forward
(raster_fwd.pallas_composite_tiles) w.r.t. the geometry rows
[x, y, conic_a, conic_b, conic_c, opacity] and every value row
(channels + depth). Structure per tile, mirroring the CUDA backward
(…/cuda_rasterizer/backward.cu:432-652) but race-free:

  pass 1 (re-walk): stream the tile's geometry chunks front-to-back,
    accumulating log-transmittance logT per pixel with the SAME
    early-termination rule as the forward — this replays exactly which
    chunks contributed (the CUDA backward instead reconstructs T by
    back-to-front division from `1 - alphas[pix]`, backward.cu:484,564).
  pass 2 (reverse walk): for chunk k from last-active to 0, reconstruct
    T at the chunk start in log space (logT_start = logT_end - sum log1p(-a)),
    then with d_acc the tile's output cotangent:

      dw      = d_acc @ vals                     (MXU)
      d_vals  = d_acc^T-contraction with w       (MXU)
      w       = alpha * exp(logT_start + logs @ U)   U = strict upper ones
      u       = dw * w
      suffix  = u @ L + carry                    L = strict lower ones (MXU)
      d_alpha = dw * Texc - suffix / (1 - alpha)
      ... chain through the alpha clamp/eps-gate to d{opacity, conic, x, y}
      carry  += row-sum(u)

    The per-pixel `suffix` carry is the exact reverse-mode term for alpha's
    effect on every LATER gaussian's transmittance — the quantity the CUDA
    kernel accumulates per thread as `last_alpha` math (backward.cu:616-649);
    here it is one (P,1) vector plus one triangular matmul per chunk, and all
    cross-pair reductions are deterministic (no atomicAdd — SURVEY.md §5.2).

Per-pair gradients are written back at the pair's slot in the sorted buffer;
reduction pair->gaussian happens outside via an unsort (payload sort by
emission position) + K-axis sum (ops/sorted_raster.py), never a scatter.

Boundary handling: tile segments are not chunk-aligned, so a tile's first
(down-aligned) chunk can cover the previous tile's last pairs. TPU grid steps
run sequentially, so the kernel read-modify-writes its first chunk when
shift > 0 (the overlapped region was necessarily written by an earlier grid
step) and plain-writes otherwise; masked lanes contribute exact zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamic3dgaussians_tpu.ops.compositing import ALPHA_EPS, ALPHA_MAX
from dynamic3dgaussians_tpu.ops.pallas.raster_fwd import (GEOM_ROWS, T_DEAD,
                                                          tile_pixel_coords)

LOG_T_DEAD = float(jnp.log(T_DEAD))


def _bwd_kernel(starts_ref, counts_ref, geom_hbm, vals_hbm, dacc_ref,
                dgeom_hbm, dvals_hbm,
                geom_vmem, vals_vmem, dgeom_scr, dvals_scr,
                old_dgeom, old_dvals, in_sems, out_sems, rmw_sems,
                *, chunk, tile_h, tile_w, grid_w, n_val):
    i = pl.program_id(0)
    start = starts_ref[i]
    count = counts_ref[i]
    base = pl.multiple_of((start // chunk) * chunk, chunk)
    shift = start - base
    n_chunks = (shift + count + chunk - 1) // chunk
    p = tile_h * tile_w
    px, py = tile_pixel_coords(i, grid_w, tile_h, tile_w)

    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    upper = (rows < cols).astype(jnp.float32)
    lower = (rows > cols).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def in_dma(slot, k, with_vals):
        off = pl.multiple_of(base + k * chunk, chunk)
        dmas = [pltpu.make_async_copy(geom_hbm.at[:, pl.ds(off, chunk)],
                                      geom_vmem.at[slot],
                                      in_sems.at[slot, 0])]
        if with_vals:
            dmas.append(pltpu.make_async_copy(
                vals_hbm.at[:, pl.ds(off, chunk)], vals_vmem.at[slot],
                in_sems.at[slot, 1]))
        return dmas

    def alpha_of(slot, k):
        g = geom_vmem[slot]
        x, y = g[0:1, :], g[1:2, :]
        ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
        op = g[5:6, :]
        dx = x - px
        dy = y - py
        p0 = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        power = jnp.minimum(p0, 0.0)
        e = jnp.exp(power)
        raw = op * e
        ok = ((lane >= shift - k * chunk)
              & (lane < shift + count - k * chunk))
        alive = (raw >= ALPHA_EPS) & ok
        alpha = jnp.where(alive, jnp.minimum(ALPHA_MAX, raw), 0.0)
        return alpha, (dx, dy, e, raw, p0, alive, ca, cb, cc)

    # ---- pass 1: forward re-walk, find logT_final and the active extent ----
    def p1_cond(c):
        k, log_t = c
        return (k < n_chunks) & (jnp.max(log_t) > LOG_T_DEAD)

    def p1_body(c):
        k, log_t = c
        slot = k % 2

        @pl.when(k + 1 < n_chunks)
        def _():
            for dma in in_dma((k + 1) % 2, k + 1, False):
                dma.start()
        for dma in in_dma(slot, k, False):
            dma.wait()
        alpha, _ = alpha_of(slot, k)
        log_t = log_t + jnp.sum(jnp.log1p(-alpha), axis=1, keepdims=True)
        return k + 1, log_t

    @pl.when(n_chunks > 0)
    def _():
        for dma in in_dma(0, 0, False):
            dma.start()
        n_active, log_t = jax.lax.while_loop(
            p1_cond, p1_body, (jnp.int32(0), jnp.zeros((p, 1), jnp.float32)))

        # Drain the dangling prefetch if pass 1 terminated early: chunk
        # n_active's geometry DMA was started by the last body but never
        # waited — its semaphore signal would corrupt a later wait.
        @pl.when(n_active < n_chunks)
        def _():
            for dma in in_dma(n_active % 2, n_active, False):
                dma.wait()

        # ---- pass 2: reverse walk ----
        d_acc = dacc_ref[0]                               # (P, CV)
        for dma in in_dma((n_active - 1) % 2, n_active - 1, True):
            dma.start()

        def p2_body(m, carry):
            log_t_end, s_carry = carry
            k = n_active - 1 - m
            slot = k % 2

            @pl.when(m + 1 < n_active)
            def _():
                for dma in in_dma((k - 1) % 2, k - 1, True):
                    dma.start()
            for dma in in_dma(slot, k, True):
                dma.wait()

            alpha, (dx, dy, e, raw, p0, alive, ca, cb, cc) = alpha_of(slot, k)
            logs = jnp.log1p(-alpha)
            s_k = jnp.sum(logs, axis=1, keepdims=True)
            log_t_start = log_t_end - s_k
            cum_excl = jax.lax.dot_general(
                logs, upper, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            t_exc = jnp.exp(log_t_start + cum_excl)       # (P, G)
            w = alpha * t_exc
            vals = vals_vmem[slot]                        # (CV, G)
            dw = jax.lax.dot_general(
                d_acc, vals, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # (P, G)
            dvals_scr[:] = jax.lax.dot_general(
                d_acc, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)      # (CV, G)
            u = dw * w
            suffix = jax.lax.dot_general(
                u, lower, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST) + s_carry
            d_alpha = dw * t_exc - suffix / (1.0 - alpha)
            d_raw = jnp.where(alive & (raw <= ALPHA_MAX), d_alpha, 0.0)
            d_power = jnp.where(p0 < 0.0, d_raw * raw, 0.0)
            zero_rows = jnp.zeros((GEOM_ROWS - 6, chunk), jnp.float32)
            dgeom_scr[:] = jnp.concatenate([
                jnp.sum(d_power * -(ca * dx + cb * dy), 0, keepdims=True),
                jnp.sum(d_power * -(cc * dy + cb * dx), 0, keepdims=True),
                jnp.sum(d_power * (-0.5 * dx * dx), 0, keepdims=True),
                jnp.sum(d_power * (-dx * dy), 0, keepdims=True),
                jnp.sum(d_power * (-0.5 * dy * dy), 0, keepdims=True),
                jnp.sum(d_raw * e, 0, keepdims=True),
                zero_rows,
            ], axis=0)

            # boundary accumulation: first chunk overlaps the previous tile
            @pl.when((k == 0) & (shift > 0))
            def _():
                off = pl.multiple_of(base, chunk)
                rg = pltpu.make_async_copy(
                    dgeom_hbm.at[:, pl.ds(off, chunk)], old_dgeom,
                    rmw_sems.at[0])
                rv = pltpu.make_async_copy(
                    dvals_hbm.at[:, pl.ds(off, chunk)], old_dvals,
                    rmw_sems.at[1])
                rg.start(); rv.start(); rg.wait(); rv.wait()
                dgeom_scr[:] += old_dgeom[:]
                dvals_scr[:] += old_dvals[:]

            off = pl.multiple_of(base + k * chunk, chunk)
            wg = pltpu.make_async_copy(
                dgeom_scr, dgeom_hbm.at[:, pl.ds(off, chunk)],
                out_sems.at[0])
            wv = pltpu.make_async_copy(
                dvals_scr, dvals_hbm.at[:, pl.ds(off, chunk)],
                out_sems.at[1])
            wg.start(); wv.start(); wg.wait(); wv.wait()

            s_carry = s_carry + jnp.sum(u, axis=1, keepdims=True)
            return log_t_start, s_carry

        jax.lax.fori_loop(0, n_active, p2_body,
                          (log_t, jnp.zeros((p, 1), jnp.float32)))

        # chunks past the early-termination point never contributed in the
        # forward walk: zero their gradient slots (they may never be written
        # otherwise). Only the region owned by THIS tile needs zeroing; the
        # shared boundary chunk is handled by the RMW rule above.
        @pl.when(n_active < n_chunks)
        def _():
            # n_active >= 1 whenever n_chunks > 0, so k >= 1 here: these
            # chunks never overlap a previous tile (only chunk 0 can) and a
            # plain zero-write is safe; lanes shared with the NEXT tile are
            # zeroed too, which its read-modify-write then adds onto.
            dgeom_scr[:] = jnp.zeros_like(dgeom_scr)
            dvals_scr[:] = jnp.zeros_like(dvals_scr)

            def z_body(k, _):
                off = pl.multiple_of(base + k * chunk, chunk)
                wg = pltpu.make_async_copy(
                    dgeom_scr, dgeom_hbm.at[:, pl.ds(off, chunk)],
                    out_sems.at[0])
                wv = pltpu.make_async_copy(
                    dvals_scr, dvals_hbm.at[:, pl.ds(off, chunk)],
                    out_sems.at[1])
                wg.start(); wv.start(); wg.wait(); wv.wait()
                return 0

            jax.lax.fori_loop(n_active, n_chunks, z_body, 0)

    # Tiles with no pairs write nothing — their slots belong to other tiles
    # (or are the zero-initialized sentinel tail).


@functools.partial(jax.jit, static_argnames=("num_tiles", "grid_w", "tile_h",
                                             "tile_w", "chunk"))
def pallas_composite_tiles_bwd(geom_t: jnp.ndarray, vals_t: jnp.ndarray,
                               tile_starts: jnp.ndarray,
                               tile_counts: jnp.ndarray,
                               d_raw: jnp.ndarray, *, num_tiles: int,
                               grid_w: int, tile_h: int, tile_w: int,
                               chunk: int = 128):
    """Run the backward tile kernel.

    Args:
      geom_t/vals_t/tile_starts/tile_counts: the forward kernel's inputs.
      d_raw: (num_tiles, P, CV) cotangent of the forward's raw accumulators.

    Returns:
      (d_geom (8, NE_pad), d_vals (CV, NE_pad)) per-pair-slot gradients.
      Slots past the last real pair are NOT written — mask with the real
      pair count before consuming.
    """
    p = tile_h * tile_w
    n_val = vals_t.shape[0]
    ne_pad = geom_t.shape[1]
    kernel = functools.partial(_bwd_kernel, chunk=chunk, tile_h=tile_h,
                               tile_w=tile_w, grid_w=grid_w, n_val=n_val)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, p, n_val), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, GEOM_ROWS, chunk), jnp.float32),
            pltpu.VMEM((2, n_val, chunk), jnp.float32),
            pltpu.VMEM((GEOM_ROWS, chunk), jnp.float32),
            pltpu.VMEM((n_val, chunk), jnp.float32),
            pltpu.VMEM((GEOM_ROWS, chunk), jnp.float32),
            pltpu.VMEM((n_val, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((GEOM_ROWS, ne_pad), jnp.float32),
                   jax.ShapeDtypeStruct((n_val, ne_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_starts, tile_counts, geom_t, vals_t, d_raw)
