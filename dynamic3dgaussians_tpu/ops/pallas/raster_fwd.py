"""Pallas TPU forward compositing kernel (the N3 renderCUDA equivalent).

One grid step per image tile, mirroring the CUDA kernel's
one-thread-block-per-tile structure (…/cuda_rasterizer/forward.cu:274-442) —
but mapped to TPU hardware instead of translated:

  * the tile's depth-sorted gaussian records live as ONE contiguous segment
    [start, start+count) of the (tile, depth)-sorted pair buffer in HBM, in a
    feature-major layout — geom (8, NE), vals (CV, NE) — so every DMA is a
    lane slice and no in-kernel transposes are needed,
  * per-tile segments are NOT chunk-aligned; the kernel aligns each DMA down
    to a chunk boundary and masks the out-of-range lanes (this removes the
    re-layout pass an aligned scheme would need — a ~1M-slot gather that
    costs more than the whole kernel on TPU),
  * the kernel double-buffers G=chunk records at a time into VMEM (the
    analogue of the staged shared-memory batches, forward.cu:311-342),
  * per chunk, the (P, G) alpha matrix is pure VPU work (pixels on sublanes,
    gaussians on lanes),
  * the front-to-back transmittance recurrence becomes
    exp(logs @ U) with U strictly-upper-triangular ones — a (P,G) x (G,G)
    matmul on the MXU instead of a sequential per-pixel loop,
  * channel accumulation is a second MXU matmul: acc += w @ vals^T,
  * early termination when every pixel's transmittance is dead
    (forward.cu:367-371's per-pixel `done`, lifted to tile granularity).

Besides the raw accumulator (channels..., depth, alpha) the kernel outputs
the per-pixel LOG transmittance and the number of chunks actually processed
— exactly the state the backward kernel (raster_bwd.py) needs to replay the
walk in reverse without a second forward pass and without the
`T_final = 1 - alpha` cancellation the CUDA backward suffers
(backward.cu:484). Background compositing / untiling stay in XLA; the
custom_vjp wiring lives in ops/sorted_raster.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamic3dgaussians_tpu.ops.compositing import ALPHA_EPS, ALPHA_MAX

GEOM_ROWS = 8  # [x, y, conic_a, conic_b, conic_c, opacity, pad, pad]
T_DEAD = 1e-4  # early-termination threshold (forward.cu:367-371)
LOG_T_DEAD = -9.210340371976182  # log(T_DEAD)


def tile_pixel_coords(i, grid_w, tile_h, tile_w):
    """(P, 1) pixel-center coordinates of tile i (row-major tiles/pixels)."""
    p = tile_h * tile_w
    ty = (i // grid_w).astype(jnp.float32)
    tx = (i % grid_w).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = tx * tile_w + (lin % tile_w).astype(jnp.float32)
    py = ty * tile_h + (lin // tile_w).astype(jnp.float32)
    return px, py


def chunk_alpha_masked(g, px, py, lane_lo, lane_hi, chunk):
    """(P, G) alpha for one record chunk with [lane_lo, lane_hi) validity.

    Shared between the forward and backward kernels so both see bitwise
    identical alphas. `g` is the (8, G) geometry block.
    """
    x, y = g[0:1, :], g[1:2, :]
    ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
    op = g[5:6, :]
    dx = x - px                               # (P, G)
    dy = y - py
    power = jnp.minimum(
        -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy, 0.0)
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    ok = (lane >= lane_lo) & (lane < lane_hi)
    return jnp.where((alpha >= ALPHA_EPS) & ok, alpha, 0.0)


def _kernel(starts_ref, counts_ref, geom_hbm, vals_hbm,
            out_ref, logt_ref, nact_ref,
            geom_vmem, vals_vmem, logt_scr, acc_scr, sems,
            *, chunk, tile_h, tile_w, grid_w, n_val):
    i = pl.program_id(0)
    start = starts_ref[i]
    count = counts_ref[i]
    base = pl.multiple_of((start // chunk) * chunk, chunk)
    shift = start - base
    n_chunks = (shift + count + chunk - 1) // chunk
    p = tile_h * tile_w
    px, py = tile_pixel_coords(i, grid_w, tile_h, tile_w)

    logt_scr[:] = jnp.zeros((p, 1), jnp.float32)
    acc_scr[:] = jnp.zeros((p, n_val), jnp.float32)
    nact_ref[0] = jnp.zeros((1, 1), jnp.int32)

    # strictly-upper-triangular ones: exclusive prefix along the chunk axis
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    upper = (rows < cols).astype(jnp.float32)

    def get_dma(slot, k):
        off = pl.multiple_of(base + k * chunk, chunk)
        return (
            pltpu.make_async_copy(geom_hbm.at[:, pl.ds(off, chunk)],
                                  geom_vmem.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(vals_hbm.at[:, pl.ds(off, chunk)],
                                  vals_vmem.at[slot], sems.at[slot, 1]),
        )

    @pl.when(n_chunks > 0)
    def _():
        for dma in get_dma(0, 0):
            dma.start()

        def cond(k):
            return (k < n_chunks) & (jnp.max(logt_scr[:]) > LOG_T_DEAD)

        def body(k):
            slot = k % 2

            @pl.when(k + 1 < n_chunks)
            def _():
                for dma in get_dma((k + 1) % 2, k + 1):
                    dma.start()

            for dma in get_dma(slot, k):
                dma.wait()

            alpha = chunk_alpha_masked(geom_vmem[slot], px, py,
                                       shift - k * chunk,
                                       shift + count - k * chunk, chunk)
            logs = jnp.log1p(-alpha)                  # (P, G)
            cum_excl = jax.lax.dot_general(
                logs, upper, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # (P, G)
            # transmittance kept purely in log space: exact under heavy
            # occlusion (no 1-alpha cancellation) and bitwise identical to
            # the backward kernel's reconstruction.
            tw = jnp.exp(cum_excl + logt_scr[:])       # (P, G)
            w = alpha * tw
            acc_scr[:] += jax.lax.dot_general(
                w, vals_vmem[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # (P, CV)
            logt_scr[:] += (cum_excl[:, chunk - 1:chunk]
                            + logs[:, chunk - 1:chunk])
            return k + 1

        k_stop = jax.lax.while_loop(cond, body, jnp.int32(0))
        nact_ref[0] = jnp.full((1, 1), k_stop, jnp.int32)

        # Drain the dangling prefetch on early termination: chunk k_stop's
        # DMAs were started by the last body iteration but never waited; a
        # leftover semaphore signal would corrupt the next grid step's waits.
        @pl.when(k_stop < n_chunks)
        def _():
            for dma in get_dma(k_stop % 2, k_stop):
                dma.wait()

    out_ref[0] = acc_scr[:]
    logt_ref[0] = logt_scr[:]


@functools.partial(jax.jit, static_argnames=("num_tiles", "grid_w", "tile_h",
                                             "tile_w", "chunk"))
def pallas_composite_tiles(geom_t: jnp.ndarray, vals_t: jnp.ndarray,
                           tile_starts: jnp.ndarray,
                           tile_counts: jnp.ndarray, *, num_tiles: int,
                           grid_w: int, tile_h: int, tile_w: int,
                           chunk: int = 128):
    """Run the forward tile kernel.

    Args:
      geom_t: (8, NE_pad) f32 rows [x, y, conic_a, conic_b, conic_c, opacity,
        0, 0] in (tile, depth)-sorted pair order. NE_pad must be a multiple
        of `chunk` with at least one chunk of slack past the last real pair
        (the kernel's down-aligned DMAs may read up to chunk-1 slots past a
        tile's segment; masked lanes contribute nothing).
      vals_t: (CV, NE_pad) f32 channel rows [channels..., depth, 1], CV % 8 == 0.
      tile_starts / tile_counts: (num_tiles,) int32 segment per tile.

    Returns:
      raw:      (num_tiles, P, CV) accumulators; channel CV-1 is the
                accumulated alpha (T_final = 1 - alpha by telescoping).
      log_t:    (num_tiles, P, 1) final per-pixel log-transmittance.
      n_active: (num_tiles, 1, 1) chunks processed before early termination.
    """
    p = tile_h * tile_w
    assert p % 8 == 0, "pallas path needs tile_h*tile_w % 8 == 0"
    n_val = vals_t.shape[0]
    assert n_val % 8 == 0, "pad vals channels to a multiple of 8"
    assert geom_t.shape[0] == GEOM_ROWS
    assert geom_t.shape[1] % chunk == 0

    kernel = functools.partial(_kernel, chunk=chunk, tile_h=tile_h,
                               tile_w=tile_w, grid_w=grid_w, n_val=n_val)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((1, p, n_val), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, GEOM_ROWS, chunk), jnp.float32),
            pltpu.VMEM((2, n_val, chunk), jnp.float32),
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, n_val), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    # CPU (tests) runs the TPU-semantics interpreter; real TPU compiles.
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, p, n_val), jnp.float32),
                   jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.float32),
                   jax.ShapeDtypeStruct((num_tiles, 1, 1), jnp.int32)],
        interpret=interpret,
    )(tile_starts, tile_counts, geom_t, vals_t)
