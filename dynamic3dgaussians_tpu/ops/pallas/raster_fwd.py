"""Pallas TPU forward compositing kernel (the N3 renderCUDA equivalent).

One grid step per image tile, mirroring the CUDA kernel's
one-thread-block-per-tile structure (…/cuda_rasterizer/forward.cu:274-442) —
but mapped to TPU hardware instead of translated:

  * the tile's depth-sorted gaussian records live as contiguous,
    chunk-aligned HBM segments (binning.aligned_pair_layout) in a
    feature-major layout — geom (8, ACAP), vals (CV, ACAP) — so every DMA is
    a 128-aligned lane slice and no in-kernel transposes are needed,
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

Outputs the raw accumulator (channels..., depth, alpha) per tile pixel;
background compositing / untiling stay in XLA. The backward pass reuses the
XLA compositing path's autodiff via jax.custom_vjp (rasterize.py) — race-free
where the CUDA backward needed atomicAdd (SURVEY.md §5.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dynamic3dgaussians_tpu.ops.compositing import ALPHA_EPS, ALPHA_MAX

GEOM_ROWS = 8  # [x, y, conic_a, conic_b, conic_c, opacity, pad, pad]


def _kernel(starts_ref, nchunks_ref, geom_hbm, vals_hbm, out_ref,
            geom_vmem, vals_vmem, t_scr, acc_scr, sems,
            *, chunk, tile_h, tile_w, grid_w, n_val):
    i = pl.program_id(0)
    start = starts_ref[i]
    n_chunks = nchunks_ref[i]
    p = tile_h * tile_w

    ty = (i // grid_w).astype(jnp.float32)
    tx = (i % grid_w).astype(jnp.float32)
    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = tx * tile_w + (lin % tile_w).astype(jnp.float32)   # (P, 1)
    py = ty * tile_h + (lin // tile_w).astype(jnp.float32)

    t_scr[:] = jnp.ones((p, 1), jnp.float32)
    acc_scr[:] = jnp.zeros((p, n_val), jnp.float32)

    # strictly-upper-triangular ones: exclusive prefix along the chunk axis
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    upper = (rows < cols).astype(jnp.float32)

    def get_dma(slot, k):
        off = pl.multiple_of(start + k * chunk, chunk)
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
            return (k < n_chunks) & (jnp.max(t_scr[:]) > 1e-4)

        def body(k):
            slot = k % 2

            @pl.when(k + 1 < n_chunks)
            def _():
                for dma in get_dma((k + 1) % 2, k + 1):
                    dma.start()

            for dma in get_dma(slot, k):
                dma.wait()

            g = geom_vmem[slot]                       # (8, G)
            x, y = g[0:1, :], g[1:2, :]
            ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
            op = g[5:6, :]
            dx = x - px                               # (P, G)
            dy = y - py
            power = jnp.minimum(
                -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy, 0.0)
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)

            logs = jnp.log1p(-alpha)                  # (P, G)
            cum_excl = jax.lax.dot_general(
                logs, upper, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # (P, G)
            tw = jnp.exp(cum_excl) * t_scr[:]          # (P, G)
            w = alpha * tw
            acc_scr[:] += jax.lax.dot_general(
                w, vals_vmem[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # (P, CV)
            t_scr[:] = (tw[:, chunk - 1:chunk]
                        * (1.0 - alpha[:, chunk - 1:chunk]))
            return k + 1

        jax.lax.while_loop(cond, body, jnp.int32(0))

    out_ref[0] = acc_scr[:]


@functools.partial(jax.jit, static_argnames=("num_tiles", "grid_w", "tile_h",
                                             "tile_w", "chunk"))
def pallas_composite_tiles(geom_t: jnp.ndarray, vals_t: jnp.ndarray,
                           aligned_starts: jnp.ndarray,
                           n_chunks: jnp.ndarray, *, num_tiles: int,
                           grid_w: int, tile_h: int, tile_w: int,
                           chunk: int = 128) -> jnp.ndarray:
    """Run the tile kernel.

    Args:
      geom_t: (8, ACAP) f32 rows [x, y, conic_a, conic_b, conic_c, opacity,
        0, 0] in aligned pair order (invalid slots must have opacity 0).
      vals_t: (CV, ACAP) f32 channel rows [channels..., depth, 1], CV % 8 == 0.
      aligned_starts / n_chunks: (num_tiles,) int32 from aligned_pair_layout.

    Returns:
      (num_tiles, tile_h*tile_w, CV) raw accumulators; channel CV-1 is the
      accumulated alpha (T_final = 1 - alpha exactly, by telescoping).
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
        out_specs=pl.BlockSpec((1, p, n_val), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
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
        out_shape=jax.ShapeDtypeStruct((num_tiles, p, n_val), jnp.float32),
        interpret=interpret,
    )(aligned_starts, n_chunks, geom_t, vals_t)
