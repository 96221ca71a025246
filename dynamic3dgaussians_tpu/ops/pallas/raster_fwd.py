"""Pallas TPU forward compositing kernel (the N3 renderCUDA equivalent).

One grid step per image tile, mirroring the CUDA kernel's
one-thread-block-per-tile structure (…/cuda_rasterizer/forward.cu:274-442) —
but mapped to TPU hardware instead of translated:

  * the tile's depth-sorted gaussian records live as ONE contiguous segment
    [start, start+count) of the (tile, depth)-sorted pair buffer in HBM, in a
    feature-major layout — one merged (8 + CV, NE) record table (geometry
    rows on top, value rows below) so each chunk is ONE DMA, not two,
  * per-tile segments are NOT chunk-aligned; the kernel aligns each DMA down
    to a chunk boundary and masks the out-of-range lanes (this removes the
    re-layout pass an aligned scheme would need — a ~1M-slot gather that
    costs more than the whole kernel on TPU),
  * the kernel double-buffers G=chunk records at a time into VMEM (the
    analogue of the staged shared-memory batches, forward.cu:311-342),
  * per chunk, the (P, G) alpha matrix is pure VPU work (pixels on sublanes,
    gaussians on lanes),
  * the front-to-back transmittance recurrence is an exclusive lane-axis
    prefix sum of log(1-alpha) with a selectable implementation
    (lane_inclusive_scan): default "matmul_split3" — 3 single-pass bf16
    MXU products against the bf16-exact {0,1} triangular matrix (~24-bit
    mantissa, half a HIGHEST dot's cost, and it avoids a pathological
    Mosaic compile the full-program HIGHEST variant hits at some shapes),
  * channel accumulation stays an MXU matmul: acc += w @ vals^T,
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

GEOM_ROWS = 8  # [x, y, conic_a', conic_b', conic_c', opacity, pad, pad]
T_DEAD = 1e-4  # early-termination threshold (forward.cu:367-371)
LOG2_T_DEAD = -13.287712379549449  # log2(T_DEAD)
# Both kernels run transmittance in BASE-2 log space: the record table's
# conic rows arrive PRE-SCALED by log2(e) (ops/sorted_raster.py), so the
# quadratic form yields log2-alpha directly and the VPU transcendentals are
# the hardware-native exp2/log2 pair — no ln<->log2 conversion multiplies
# anywhere in the hot loop. (exp(x) lowers as exp2(x*log2e) anyway; folding
# the constant into the conics makes the conversion free, and log2(1-alpha)
# replaces the costlier log1p — safe because any nonzero alpha >= 1/255, so
# 1-alpha is computed exactly to f32 rounding.)
LN2 = 0.6931471805599453

# Mosaic supports only HIGHEST/DEFAULT dot precisions; after the cumsum
# rewrite the kernels' matmuls are (P,G)@(G,CV)-sized and negligible, so
# "high" simply aliases the bit-tight HIGHEST.
PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
              "high": jax.lax.Precision.HIGHEST,
              "default": jax.lax.Precision.DEFAULT}


def lane_inclusive_scan(x, chunk, interpret, impl="matmul_split3"):
    """Inclusive prefix sum along the lane (chunk) axis.

    Mosaic has no cumsum lowering, so compiled kernels choose (measured on
    v5e at the bench shape):
      * "matmul_split3": x split into 3 bf16 rounds, each multiplied by the
        constant lower-triangular ones matrix in ONE bf16 MXU pass (the
        {0,1} matrix is bf16-exact, so each pass is exact given its input
        round) — ~24-bit-mantissa result at half the cost of a HIGHEST dot.
      * "matmul_highest": single f32 HIGHEST dot (bit-tight, 6 bf16 passes).
      * "roll_scan": Hillis-Steele pltpu.roll scan — measured SLOWER than
        the matmuls on v5e (lane rolls are not cheap in Mosaic); kept for
        comparison.
      * "matmul_block128": hierarchical two-level scan for chunk > 128 —
        scan each 128-lane block with the split3 matmuls, then add the
        running block totals. Scan FLOPs stay P*128 per element instead of
        P*chunk, so a big chunk amortizes loop/DMA overhead without paying
        a quadratically larger triangular matmul.
    Interpret mode (CPU tests) uses jnp.cumsum — same math, accumulation
    order differs by ~1 ulp per term.
    """
    if interpret:
        return jnp.cumsum(x, axis=1)
    if impl == "matmul_block128" and chunk > 128 and chunk % 128 != 0:
        # a non-multiple chunk > 128 would scan only the first
        # floor(chunk/128) blocks and surface later as an opaque shape
        # error deep in the kernel — fail with the actual constraint
        # instead. chunk <= 128 correctly falls through to matmul_split3.
        raise ValueError(
            f"scan_impl='matmul_block128' requires chunk % 128 == 0, "
            f"got chunk={chunk}")
    if impl == "matmul_block128" and chunk > 128:
        p = x.shape[0]
        blocks = chunk // 128
        parts = []
        carry = jnp.zeros((p, 1), jnp.float32)
        for b in range(blocks):
            xb = x[:, b * 128:(b + 1) * 128]
            sb = lane_inclusive_scan(xb, 128, interpret, "matmul_split3")
            parts.append(sb + carry)
            carry = carry + sb[:, 127:128]
        return jnp.concatenate(parts, axis=1)
    if impl == "matmul_block128":
        impl = "matmul_split3"
    if impl == "roll_scan":
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        d = 1
        while d < chunk:
            shifted = pltpu.roll(x, d, axis=1)
            x = x + jnp.where(lane >= d, shifted, 0.0)
            d *= 2
        return x
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    lower_incl = (rows <= cols)
    if impl == "matmul_highest":
        tri = lower_incl.astype(jnp.float32)
        return jax.lax.dot_general(
            x, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    assert impl == "matmul_split3", impl
    tri16 = lower_incl.astype(jnp.bfloat16)
    a1 = x.astype(jnp.bfloat16)
    r1 = x - a1.astype(jnp.float32)
    a2 = r1.astype(jnp.bfloat16)
    a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)

    def bdot(a):
        return jax.lax.dot_general(
            a, tri16, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return (bdot(a3) + bdot(a2)) + bdot(a1)


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
    identical alphas. `g` is the (8, G) geometry block whose conic rows are
    pre-scaled by log2(e): the quadratic form is log2-alpha's exponent.
    """
    x, y = g[0:1, :], g[1:2, :]
    ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
    op = g[5:6, :]
    dx = x - px                               # (P, G)
    dy = y - py
    power = jnp.minimum(
        -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy, 0.0)
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp2(power))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    ok = (lane >= lane_lo) & (lane < lane_hi)
    return jnp.where((alpha >= ALPHA_EPS) & ok, alpha, 0.0)


def tile_pixel_feats(px, py, tile_ox, tile_oy, p):
    """(P, 8) bf16 bilinear pixel-feature matrix for the MXU power path.

    Tile-RELATIVE coordinates keep every entry an integer <= 255, which
    bf16's 8-bit mantissa represents EXACTLY — so the matmul's only error
    is the 3-round splitting of the gaussian coefficients (~2^-24 rel).
    """
    rx = px - tile_ox                          # (P, 1) in [0, tile_w)
    ry = py - tile_oy
    one = jnp.ones((p, 1), jnp.float32)
    feats = jnp.concatenate(
        [one, rx, ry, rx * rx, rx * ry, ry * ry,
         jnp.zeros((p, 2), jnp.float32)], axis=1)
    return feats.astype(jnp.bfloat16)


def chunk_power_mxu(g, feats16, tile_ox, tile_oy):
    """Raw power p0 as a bilinear form on the MXU.

    power0(p, g) = F(p) . C(g) with F = [1, x, y, x^2, xy, y^2] in
    tile-relative pixel coordinates and C derived per chunk from the
    geometry rows — ONE (P, 8) @ (8, G) contraction (3 bf16 rounds against
    the exact-bf16 F, ~24-bit result) replaces the ~9 elementwise VPU ops
    per cell of the quadratic-form expansion.
    """
    gx = g[0:1, :] - tile_ox                   # (1, G) tile-relative center
    gy = g[1:2, :] - tile_oy
    ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
    coef = jnp.concatenate([
        -0.5 * (ca * gx * gx + cc * gy * gy) - cb * gx * gy,
        ca * gx + cb * gy,
        cc * gy + cb * gx,
        jnp.broadcast_to(-0.5 * ca, ca.shape),
        -cb,
        jnp.broadcast_to(-0.5 * cc, cc.shape),
        jnp.zeros_like(ca), jnp.zeros_like(ca)], axis=0)   # (8, G)
    c1 = coef.astype(jnp.bfloat16)
    r1 = coef - c1.astype(jnp.float32)
    c2 = r1.astype(jnp.bfloat16)
    c3 = (r1 - c2.astype(jnp.float32)).astype(jnp.bfloat16)

    def bdot(c):
        return jax.lax.dot_general(
            feats16, c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return (bdot(c3) + bdot(c2)) + bdot(c1)    # (P, G)


def chunk_alpha_masked_mxu(g, feats16, tile_ox, tile_oy, lane_lo, lane_hi,
                          chunk):
    """MXU variant of chunk_alpha_masked: power via chunk_power_mxu."""
    op = g[5:6, :]
    p0 = chunk_power_mxu(g, feats16, tile_ox, tile_oy)
    power = jnp.minimum(p0, 0.0)
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp2(power))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    ok = (lane >= lane_lo) & (lane < lane_hi)
    return jnp.where((alpha >= ALPHA_EPS) & ok, alpha, 0.0)


# log2(ALPHA_EPS): alpha >= eps in log2-alpha space (the fused-op path's
# EPS cutoff compares the exponent, saving the post-exp2 compare)
LOG2_ALPHA_EPS = -7.994353436858858
# dead-cell exponent: far below any live log2-alpha; exp2() of it (and of
# it plus any log-transmittance) flushes to 0.0 in f32
DEAD_EXP = -130.0


def chunk_logalpha_fused(g, feats16, tile_ox, tile_oy, lane_lo, lane_hi,
                         chunk):
    """(P, G) LOG2-alpha for the fused-op MXU path, -130 on dead cells.

    Uses the two table rows the other paths leave as pad (sorted_raster.py
    fills them when power_impl == "mxu_fused"):
      row 6 = log2(max(opacity, 2^-100))
      row 7 = min(row 6, log2(ALPHA_MAX))
    so per cell:  m = min(p0 + r6, r7)  ==  log2(min(ALPHA_MAX,
    op * exp2(min(p0, 0)))) up to one f32 rounding of log2(op) — the whole
    alpha clamp chain (2 mins + 1 mul of the unfused path) in 2 VPU ops,
    with the out-of-segment lane mask folded into the (1, G) clamp row
    instead of a per-cell (P, G) iota-compare-and-select chain.
    """
    r6 = g[6:7, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    ok = (lane >= lane_lo) & (lane < lane_hi)
    r7m = jnp.where(ok, g[7:8, :], DEAD_EXP)       # (1, G) — not per cell
    p0 = chunk_power_mxu(g, feats16, tile_ox, tile_oy)
    m = jnp.minimum(p0 + r6, r7m)
    return jnp.where(m >= LOG2_ALPHA_EPS, m, DEAD_EXP)


def _kernel(starts_ref, counts_ref, rec_hbm,
            out_ref, logt_ref, nact_ref,
            rec_vmem, head_vmem, logt_scr, acc_scr, sems, head_sems,
            *, chunk, tile_h, tile_w, grid_w, n_val, mxu_prec, interpret,
            scan_impl, power_impl, tile_batch):
    """Process `tile_batch` tiles per grid step.

    Probe r5 #1 (artifacts/r5_probe.log) measured ~2 us of fixed cost per
    GRID STEP (grid bookkeeping + the serialized first-chunk DMA stall per
    tile; chunk count and block sizes were near-neutral). Two structural
    counters, both here:
      * tile_batch > 1 amortizes the per-step overhead T-fold,
      * every tile's FIRST chunk is DMA'd into a dedicated head slot AT THE
        TOP of the step — by the time tile j's walk starts, its head DMA
        has been in flight for j whole tile walks, hiding the HBM latency
        the old per-tile cold start paid 920 times per frame.
    """
    step = pl.program_id(0)
    p = tile_h * tile_w

    def seg(jt):
        i = step * tile_batch + jt
        start = starts_ref[i]
        count = counts_ref[i]
        base = pl.multiple_of((start // chunk) * chunk, chunk)
        shift = start - base
        # empty tiles contribute nothing even when unaligned (shift > 0
        # would otherwise schedule one fully-masked chunk) — skip outright
        n_chunks = jnp.where(count == 0, 0,
                             (shift + count + chunk - 1) // chunk)
        return i, base, shift, count, n_chunks

    # ---- issue every tile's head-chunk DMA up front ----
    for jt in range(tile_batch):
        _, base, _, _, n_chunks = seg(jt)

        @pl.when(n_chunks > 0)
        def _(jt=jt, base=base):
            pltpu.make_async_copy(rec_hbm.at[:, pl.ds(base, chunk)],
                                  head_vmem.at[jt],
                                  head_sems.at[jt]).start()

    # ---- sequential per-tile walks ----
    for jt in range(tile_batch):
        i, base, shift, count, n_chunks = seg(jt)
        px, py = tile_pixel_coords(i, grid_w, tile_h, tile_w)
        if power_impl in ("mxu", "mxu_fused"):
            tile_ox = (i % grid_w).astype(jnp.float32) * tile_w
            tile_oy = (i // grid_w).astype(jnp.float32) * tile_h
            feats16 = tile_pixel_feats(px, py, tile_ox, tile_oy, p)

        logt_scr[:] = jnp.zeros((p, 1), jnp.float32)
        acc_scr[:] = jnp.zeros((p, n_val), jnp.float32)
        nact_ref[jt] = jnp.zeros((1, 1), jnp.int32)

        def get_dma(slot, k, base=base):
            off = pl.multiple_of(base + k * chunk, chunk)
            return pltpu.make_async_copy(rec_hbm.at[:, pl.ds(off, chunk)],
                                         rec_vmem.at[slot], sems.at[slot])

        def process(records, k, shift=shift, count=count):
            if power_impl == "mxu_fused":
                # fused-op cell pipeline: ~10 VPU ops/cell (3 transcendental)
                # vs ~15 on the unfused paths — alpha clamps ride the
                # precomputed log2-opacity rows, the lane mask rides the
                # (1, G) clamp row, and alpha * T collapses into ONE exp2
                # of (log2-alpha + log2-T).
                m = chunk_logalpha_fused(
                    records[:GEOM_ROWS], feats16, tile_ox, tile_oy,
                    shift - k * chunk, shift + count - k * chunk, chunk)
                alpha = jnp.exp2(m)                      # (P, G)
                logs = jnp.log2(1.0 - alpha)
                cum_incl = lane_inclusive_scan(logs, chunk, interpret,
                                               scan_impl)
                w = jnp.exp2(m + (cum_incl - logs) + logt_scr[:])
                acc_scr[:] += jax.lax.dot_general(
                    w, records[GEOM_ROWS:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mxu_prec)                  # (P, CV)
                logt_scr[:] += cum_incl[:, chunk - 1:chunk]
                return
            if power_impl == "mxu":
                alpha = chunk_alpha_masked_mxu(
                    records[:GEOM_ROWS], feats16, tile_ox, tile_oy,
                    shift - k * chunk, shift + count - k * chunk, chunk)
            else:
                alpha = chunk_alpha_masked(
                    records[:GEOM_ROWS], px, py, shift - k * chunk,
                    shift + count - k * chunk, chunk)
            logs = jnp.log2(1.0 - alpha)            # (P, G); 0 for masked
            # exclusive prefix along the chunk axis as a VPU scan; the MXU
            # triangular-matmul formulation costs ~an order of magnitude
            # more at f32 precision
            cum_incl = lane_inclusive_scan(logs, chunk, interpret,
                                           scan_impl)
            cum_excl = cum_incl - logs
            # transmittance kept purely in log2 space: exact under heavy
            # occlusion (no 1-alpha cancellation) and bitwise identical to
            # the backward kernel's reconstruction.
            tw = jnp.exp2(cum_excl + logt_scr[:])    # (P, G)
            w = alpha * tw
            acc_scr[:] += jax.lax.dot_general(
                w, records[GEOM_ROWS:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_prec)                  # (P, CV)
            logt_scr[:] += cum_incl[:, chunk - 1:chunk]

        @pl.when(n_chunks > 0)
        def _(jt=jt, n_chunks=n_chunks, get_dma=get_dma, process=process):
            # chunk 1 prefetch overlaps chunk 0's (head-slot) compute
            @pl.when(n_chunks > 1)
            def _():
                get_dma(1, 1).start()

            pltpu.make_async_copy(rec_hbm.at[:, pl.ds(base, chunk)],
                                  head_vmem.at[jt],
                                  head_sems.at[jt]).wait()
            process(head_vmem[jt], 0)

            def cond(k):
                return (k < n_chunks) & (jnp.max(logt_scr[:]) > LOG2_T_DEAD)

            def body(k):
                slot = k % 2

                @pl.when(k + 1 < n_chunks)
                def _():
                    get_dma((k + 1) % 2, k + 1).start()

                get_dma(slot, k).wait()
                process(rec_vmem[slot], k)
                return k + 1

            k_stop = jax.lax.while_loop(cond, body, jnp.int32(1))
            nact_ref[jt] = jnp.full((1, 1), k_stop, jnp.int32)

            # Drain the dangling prefetch on early termination: chunk
            # k_stop's DMA was started (by the initial chunk-1 prefetch or
            # the last body iteration) but never waited; a leftover
            # semaphore signal would corrupt a later wait on that slot.
            @pl.when(k_stop < n_chunks)
            def _():
                get_dma(k_stop % 2, k_stop).wait()

        out_ref[jt] = acc_scr[:]
        logt_ref[jt] = logt_scr[:]


@functools.partial(jax.jit, static_argnames=("num_tiles", "grid_w", "tile_h",
                                             "tile_w", "chunk", "precision",
                                             "scan_impl", "power_impl",
                                             "tile_batch"))
def pallas_composite_tiles(rec_t: jnp.ndarray,
                           tile_starts: jnp.ndarray,
                           tile_counts: jnp.ndarray, *, num_tiles: int,
                           grid_w: int, tile_h: int, tile_w: int,
                           chunk: int = 128, precision: str = "highest",
                           scan_impl: str = "matmul_split3",
                           power_impl: str = "vpu", tile_batch: int = 1):
    """Run the forward tile kernel.

    Args:
      rec_t: (8 + CV, NE_pad) f32 merged record table in (tile, depth)-
        sorted pair order: rows [0:8] = [x, y, conic_a, conic_b, conic_c,
        opacity, 0, 0]; rows [8:] = [channels..., depth, 1(, pad)] with the
        value-row count CV % 8 == 0. NE_pad must be a multiple of `chunk`
        with at least one chunk of slack past the last real pair (the
        kernel's down-aligned DMAs may read up to chunk-1 slots past a
        tile's segment; masked lanes contribute nothing).
      tile_starts / tile_counts: (num_tiles,) int32 segment per tile.

    Returns:
      raw:      (num_tiles, P, CV) accumulators; channel CV-1 is the
                accumulated alpha (T_final = 1 - alpha by telescoping).
      log_t:    (num_tiles, P, 1) final per-pixel log-transmittance.
      n_active: (num_tiles, 1, 1) chunks processed before early termination.
    """
    p = tile_h * tile_w
    assert p % 8 == 0, "pallas path needs tile_h*tile_w % 8 == 0"
    if power_impl in ("mxu", "mxu_fused") and max(tile_h, tile_w) > 16:
        # tile_pixel_feats' bf16-exactness (rx*ry <= 225) breaks past
        # 16-px tiles; fail loudly instead of silently degrading alpha
        raise ValueError("power_impl='mxu' requires tile_h, tile_w <= 16")
    n_rows = rec_t.shape[0]
    n_val = n_rows - GEOM_ROWS
    assert n_val % 8 == 0, "pad vals channels to a multiple of 8"
    assert rec_t.shape[1] % chunk == 0

    interpret = jax.default_backend() != "tpu"
    t = max(1, tile_batch)
    nt_pad = -(-num_tiles // t) * t
    if nt_pad != num_tiles:
        # padded tiles carry count == 0 and are skipped by the kernel
        tile_starts = jnp.pad(tile_starts, (0, nt_pad - num_tiles))
        tile_counts = jnp.pad(tile_counts, (0, nt_pad - num_tiles))
    kernel = functools.partial(_kernel, chunk=chunk, tile_h=tile_h,
                               tile_w=tile_w, grid_w=grid_w, n_val=n_val,
                               mxu_prec=PRECISIONS[precision],
                               interpret=interpret, scan_impl=scan_impl,
                               power_impl=power_impl, tile_batch=t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt_pad // t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((t, p, n_val), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, p, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, n_rows, chunk), jnp.float32),
            pltpu.VMEM((t, n_rows, chunk), jnp.float32),   # head slots
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, n_val), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((t,)),
        ],
    )
    # CPU (tests) runs the TPU-semantics interpreter; real TPU compiles.
    out, logt, nact = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nt_pad, p, n_val), jnp.float32),
                   jax.ShapeDtypeStruct((nt_pad, p, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nt_pad, 1, 1), jnp.int32)],
        interpret=interpret,
    )(tile_starts, tile_counts, rec_t)
    if nt_pad != num_tiles:
        out, logt, nact = (out[:num_tiles], logt[:num_tiles],
                           nact[:num_tiles])
    return out, logt, nact
