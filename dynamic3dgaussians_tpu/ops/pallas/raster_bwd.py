"""Pallas TPU backward compositing kernel (the N4 renderCUDA<3> equivalent).

Computes per-pair gradients of the tile compositing forward
(raster_fwd.pallas_composite_tiles) w.r.t. the geometry rows
[x, y, conic_a, conic_b, conic_c, opacity] and every value row
(channels + depth). One reverse chunk walk per tile, mirroring the CUDA
backward (…/cuda_rasterizer/backward.cu:432-652) but race-free and without a
re-render: the forward kernel hands over the per-pixel final LOG
transmittance and the processed-chunk count, so chunk-start transmittances
reconstruct by log-space subtraction (the CUDA kernel instead divides
`T / (1 - alpha)` starting from `1 - alphas[pix]`, backward.cu:484,564 — a
catastrophic-cancellation path we avoid).

Per chunk k (reverse), with d_acc the tile's output cotangent:

    logT_start = logT_end - sum(log1p(-alpha))
    Texc    = exp(logT_start + excl-cumsum(logs))      (VPU scan)
    w       = alpha * Texc
    dw      = d_acc @ vals                             (MXU)
    d_vals  = d_acc^T-contraction with w               (MXU)
    u       = dw * w
    suffix  = (rowsum(u) - incl-cumsum(u)) + carry     (VPU scan)
    d_alpha = dw * Texc - suffix / (1 - alpha)
    ... chain through the alpha clamp/eps-gate to d{opacity, conic, x, y}
    carry  += rowsum(u)

The per-pixel `suffix` carry is the exact reverse-mode term for alpha's
effect on every LATER gaussian's transmittance — the quantity the CUDA
kernel accumulates per thread via `last_alpha` (backward.cu:616-649); here
both triangular terms are lane-axis prefix sums on the VPU (the earlier
MXU triangular-matmul formulation dominated kernel time at f32 precision),
and all cross-pair reductions are deterministic (no atomicAdd — SURVEY.md
§5.2).

Per-pair gradients are written back at the pair's slot in the sorted buffer
as ONE fused (8 + CV, chunk) block per chunk, double-buffered; reduction
pair->gaussian happens outside via an unsort (payload sort by emission
position) + K-axis sum (ops/sorted_raster.py), never a scatter. Input
records stream from the same merged (8 + CV, NE) table the forward reads —
one DMA per chunk.

Boundary handling: tile segments are not chunk-aligned, so a tile's first
(down-aligned) chunk can cover the previous tile's last pairs. TPU grid steps
run sequentially and every grid step drains its output DMAs before ending, so
the kernel read-modify-writes its first chunk when shift > 0 (the overlapped
region was necessarily written by an earlier grid step) and plain-writes
otherwise; masked lanes contribute exact zeros.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamic3dgaussians_tpu.ops.compositing import ALPHA_EPS, ALPHA_MAX
from dynamic3dgaussians_tpu.ops.pallas.raster_fwd import (
    GEOM_ROWS, LN2, PRECISIONS, chunk_power_mxu, lane_inclusive_scan,
    tile_pixel_coords, tile_pixel_feats)


def _power_moments(d_power, feats16):
    """(8, G) moments M = F^T @ d_power via 3 bf16 MXU rounds.

    Row layout follows tile_pixel_feats' F = [1, rx, ry, rx^2, rx*ry,
    ry^2, 0, 0] (tile-relative integer pixel coords — exact in bf16):
    M[0] = sum_p d_power, M[1] = sum d_power*rx, M[2] = *ry, M[3] = *rx^2,
    M[4] = *rx*ry, M[5] = *ry^2. Every per-pair conic/position gradient
    row is then an O(G) polynomial in these moments (the P-sized
    reductions leave the VPU entirely)."""
    a1 = d_power.astype(jnp.bfloat16)
    r1 = d_power - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)

    def bdot(x):
        return jax.lax.dot_general(
            feats16, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return (bdot(a3) + bdot(a2)) + bdot(a1)


def _bwd_kernel(starts_ref, counts_ref, nact_ref, rec_hbm,
                dacc_ref, logt_ref, dout_hbm,
                rec_vmem, dout_scr, old_scr,
                in_sems, out_sems, rmw_sem,
                *, chunk, tile_h, tile_w, grid_w, n_val, mxu_prec,
                interpret, scan_impl, power_impl):
    i = pl.program_id(0)
    start = starts_ref[i]
    count = counts_ref[i]
    n_active = nact_ref[i]
    base = pl.multiple_of((start // chunk) * chunk, chunk)
    shift = start - base
    # mirror the forward's empty-tile skip: an unaligned empty tile must
    # not zero-fill its down-aligned chunk (those slots belong to the
    # previous tile's pairs and were already written)
    n_chunks = jnp.where(count == 0, 0,
                         (shift + count + chunk - 1) // chunk)
    px, py = tile_pixel_coords(i, grid_w, tile_h, tile_w)
    if power_impl == "mxu":
        p_pix = tile_h * tile_w
        tile_ox = (i % grid_w).astype(jnp.float32) * tile_w
        tile_oy = (i // grid_w).astype(jnp.float32) * tile_h
        feats16 = tile_pixel_feats(px, py, tile_ox, tile_oy, p_pix)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    n_out = GEOM_ROWS + n_val

    def in_dma(slot, k):
        off = pl.multiple_of(base + k * chunk, chunk)
        return pltpu.make_async_copy(rec_hbm.at[:, pl.ds(off, chunk)],
                                     rec_vmem.at[slot], in_sems.at[slot])

    def out_dma(oslot, k):
        off = pl.multiple_of(base + k * chunk, chunk)
        return pltpu.make_async_copy(
            dout_scr.at[oslot], dout_hbm.at[:, pl.ds(off, chunk)],
            out_sems.at[oslot])

    # ---- zero-fill chunks past the forward's early-termination point ----
    # (they never contributed; k >= 1 here — see module docstring — so a
    # plain write is safe; lanes shared with the NEXT tile get zeroed and
    # that tile's read-modify-write adds onto them.)
    @pl.when(n_active < n_chunks)
    def _():
        dout_scr[0] = jnp.zeros_like(dout_scr[0])

        def z_body(k, _):
            dma = out_dma(0, k)
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(n_active, n_chunks, z_body, 0)

    # ---- reverse walk over the active chunks ----
    @pl.when(n_active > 0)
    def _():
        d_acc = dacc_ref[0]                               # (P, CV)
        in_dma((n_active - 1) % 2, n_active - 1).start()

        def body(m, carry):
            log_t_end, s_carry = carry
            k = n_active - 1 - m
            slot = k % 2
            oslot = m % 2

            @pl.when(m + 1 < n_active)
            def _():
                in_dma((k - 1) % 2, k - 1).start()
            in_dma(slot, k).wait()

            # recompute alpha exactly as the forward did
            g = rec_vmem[slot, :GEOM_ROWS]
            x, y = g[0:1, :], g[1:2, :]
            ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
            op = g[5:6, :]
            if power_impl == "mxu":
                p0 = chunk_power_mxu(g, feats16, tile_ox, tile_oy)
            else:
                dx = x - px
                dy = y - py
                p0 = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            power = jnp.minimum(p0, 0.0)
            e = jnp.exp2(power)           # conic rows pre-scaled by log2(e)
            raw = op * e
            ok = ((lane >= shift - k * chunk)
                  & (lane < shift + count - k * chunk))
            alive = (raw >= ALPHA_EPS) & ok
            alpha = jnp.where(alive, jnp.minimum(ALPHA_MAX, raw), 0.0)

            logs = jnp.log2(1.0 - alpha)
            cum_incl = lane_inclusive_scan(logs, chunk, interpret,
                                           scan_impl)
            cum_excl = cum_incl - logs
            s_k = cum_incl[:, chunk - 1:chunk]
            log_t_start = log_t_end - s_k
            t_exc = jnp.exp2(log_t_start + cum_excl)      # (P, G)
            w = alpha * t_exc
            vals = rec_vmem[slot, GEOM_ROWS:]             # (CV, G)
            dw = jax.lax.dot_general(
                d_acc, vals, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_prec)                       # (P, G)
            u = dw * w
            u_incl = lane_inclusive_scan(u, chunk, interpret, scan_impl)
            u_tot = u_incl[:, chunk - 1:chunk]
            suffix = (u_tot - u_incl) + s_carry           # strict lower sum
            d_alpha = dw * t_exc - suffix / (1.0 - alpha)
            d_raw = jnp.where(alive & (raw <= ALPHA_MAX), d_alpha, 0.0)
            # alpha = op * 2^power: d alpha / d power = raw * ln2
            d_power = jnp.where(p0 < 0.0, d_raw * raw * LN2, 0.0)

            # wait for this output slot's previous write before refilling
            @pl.when(m >= 2)
            def _():
                out_dma(oslot, k + 2).wait()

            if power_impl == "mxu":
                # six P-sized gradient reductions as ONE moment matmul
                # (see _power_moments) + an O(G) polynomial epilogue in
                # the tile-relative gaussian center (gx, gy): with
                # dx = gx - rx, sum d_power*dx = gx*M0 - Mx, etc.
                mom = _power_moments(d_power, feats16)        # (8, G)
                m0, mx_, my_ = mom[0:1], mom[1:2], mom[2:3]
                mxx, mxy, myy = mom[3:4], mom[4:5], mom[5:6]
                gx = x - tile_ox
                gy = y - tile_oy
                sdx = gx * m0 - mx_               # sum_p d_power * dx
                sdy = gy * m0 - my_
                dout_scr[oslot, 0:1] = -(ca * sdx + cb * sdy)
                dout_scr[oslot, 1:2] = -(cc * sdy + cb * sdx)
                dout_scr[oslot, 2:3] = -0.5 * (gx * gx * m0
                                               - 2.0 * gx * mx_ + mxx)
                dout_scr[oslot, 3:4] = -(gx * gy * m0 - gx * my_
                                         - gy * mx_ + mxy)
                dout_scr[oslot, 4:5] = -0.5 * (gy * gy * m0
                                               - 2.0 * gy * my_ + myy)
            else:
                dout_scr[oslot, 0:1] = jnp.sum(
                    d_power * -(ca * dx + cb * dy), 0, keepdims=True)
                dout_scr[oslot, 1:2] = jnp.sum(
                    d_power * -(cc * dy + cb * dx), 0, keepdims=True)
                dout_scr[oslot, 2:3] = jnp.sum(
                    d_power * (-0.5 * dx * dx), 0, keepdims=True)
                dout_scr[oslot, 3:4] = jnp.sum(
                    d_power * (-dx * dy), 0, keepdims=True)
                dout_scr[oslot, 4:5] = jnp.sum(
                    d_power * (-0.5 * dy * dy), 0, keepdims=True)
            dout_scr[oslot, 5:6] = jnp.sum(d_raw * e, 0, keepdims=True)
            dout_scr[oslot, 6:GEOM_ROWS] = jnp.zeros(
                (GEOM_ROWS - 6, chunk), jnp.float32)
            dout_scr[oslot, GEOM_ROWS:] = jax.lax.dot_general(
                d_acc, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_prec)                       # (CV, G)

            # boundary accumulation: first chunk overlaps the previous tile
            @pl.when((k == 0) & (shift > 0))
            def _():
                off = pl.multiple_of(base, chunk)
                rd = pltpu.make_async_copy(
                    dout_hbm.at[:, pl.ds(off, chunk)], old_scr, rmw_sem)
                rd.start()
                rd.wait()
                dout_scr[oslot] += old_scr[:]

            out_dma(oslot, k).start()

            s_carry = s_carry + u_tot
            return log_t_start, s_carry

        jax.lax.fori_loop(0, n_active, body,
                          (logt_ref[0], jnp.zeros_like(logt_ref[0])))

        # drain outstanding output writes before the grid step ends (the
        # next tile's read-modify-write may read what we just wrote)
        @pl.when(n_active >= 2)
        def _():
            out_dma((n_active - 2) % 2, 1).wait()
        out_dma((n_active - 1) % 2, 0).wait()


@functools.partial(jax.jit, static_argnames=("num_tiles", "grid_w", "tile_h",
                                             "tile_w", "chunk", "precision",
                                             "scan_impl", "power_impl"))
def pallas_composite_tiles_bwd(rec_t: jnp.ndarray,
                               tile_starts: jnp.ndarray,
                               tile_counts: jnp.ndarray,
                               n_active: jnp.ndarray,
                               log_t: jnp.ndarray,
                               d_raw: jnp.ndarray, *, num_tiles: int,
                               grid_w: int, tile_h: int, tile_w: int,
                               chunk: int = 128, precision: str = "highest",
                               scan_impl: str = "matmul_split3",
                               power_impl: str = "vpu"):
    """Run the backward tile kernel.

    Args:
      rec_t/tile_starts/tile_counts: the forward kernel's inputs (merged
        (8 + CV, NE_pad) record table).
      n_active: (num_tiles,) int32 processed-chunk counts from the forward.
      log_t: (num_tiles, P, 1) final log-transmittance from the forward.
      d_raw: (num_tiles, P, CV) cotangent of the forward's raw accumulators.

    Returns:
      d_out (8 + CV, NE_pad): rows [0:6] = d{x, y, conic_a, conic_b,
      conic_c, opacity}, rows [8:8+CV] = d(vals rows). Slots past the last
      real pair are never written — mask before consuming.
    """
    p = tile_h * tile_w
    if power_impl == "mxu" and max(tile_h, tile_w) > 16:
        # same guard as pallas_composite_tiles: tile_pixel_feats'
        # bf16-exactness (rx*ry <= 225) breaks past 16-px tiles — a direct
        # caller bypassing the forward must not silently get degraded grads
        raise ValueError("power_impl='mxu' requires tile_h, tile_w <= 16")
    n_rows = rec_t.shape[0]
    n_val = n_rows - GEOM_ROWS
    ne_pad = rec_t.shape[1]
    n_out = GEOM_ROWS + n_val
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_bwd_kernel, chunk=chunk, tile_h=tile_h,
                               tile_w=tile_w, grid_w=grid_w, n_val=n_val,
                               mxu_prec=PRECISIONS[precision],
                               interpret=interpret, scan_impl=scan_impl,
                               power_impl=power_impl)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, p, n_val), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, n_rows, chunk), jnp.float32),
            pltpu.VMEM((2, n_out, chunk), jnp.float32),
            pltpu.VMEM((n_out, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, ne_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_starts, tile_counts, n_active, rec_t, d_raw, log_t)
