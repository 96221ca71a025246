"""Sorted-pair rasterization: the production TPU render/grad path.

Ties together the three pieces the CUDA reference implements as
`duplicateWithKeys -> radix sort -> renderCUDA` + `BACKWARD::render`
(…/cuda_rasterizer/rasterizer_impl.cu:281-343, backward.cu:432-652), built
around what is fast on TPU (measured on v5e):

  * `lax.sort` runs near memcpy speed and carries payload rows ~for free;
    dynamic gathers/scatters cost ~10 cycles/element. So the per-pair record
    fields are BROADCAST at emission and ride through ONE two-key
    (tile, depth) sort — there is no gather anywhere on the forward path and
    no scatter anywhere on the backward path.
  * The backward's pair->gaussian reduction is an UNSORT (a second payload
    sort keyed on the pair's emission position) followed by a (K, N) axis
    sum — the deterministic, race-free equivalent of the reference's
    atomicAdd gradient accumulation (SURVEY.md §5.2).
  * Emission slots are k-major (slot = k * N + gaussian) so the unsorted
    gradient rows reshape to (K, N) with the big N on the lane axis.

The jax.custom_vjp pair (forward kernel raster_fwd.py, backward kernel
raster_bwd.py) spans sort -> kernel, so XLA autodiff never differentiates
through the sort (whose transpose would be a scatter).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dynamic3dgaussians_tpu.ops.binning import emit_pairs, tile_ranges
from dynamic3dgaussians_tpu.ops.pallas.raster_bwd import \
    pallas_composite_tiles_bwd
from dynamic3dgaussians_tpu.ops.pallas.raster_fwd import (
    GEOM_ROWS, pallas_composite_tiles)
from dynamic3dgaussians_tpu.ops.projection import Projected


def _float0(x):
    return np.zeros(np.shape(x), jax.dtypes.float0)


def depth_key_bits(num_tiles: int) -> int:
    """Bits of quantized depth available in a fused (tile | depth) i32 key.

    The key must stay non-negative in int32: bits_tile + bits_z = 31.
    Returns 0 when the tile grid is too large for a useful fused key (the
    caller falls back to the exact two-key sort).
    """
    bits_tile = max(1, (num_tiles + 1 - 1).bit_length())
    bits_z = 31 - bits_tile
    return bits_z if bits_z >= 18 else 0


def fuse_tile_depth_key(tile_key: jnp.ndarray, depth: jnp.ndarray,
                        bits_z: int) -> jnp.ndarray:
    """Pack (tile, depth) into ONE i32 sort key: tile<<bits_z | z_bits.

    The CUDA reference does exactly this in 64-bit (tileID<<32 |
    float_bits(z), rasterizer_impl.cu:102-104); on TPU a 32-bit key sorts
    ~a full payload row cheaper than 64-bit or two keys. Positive-float
    bits are order-preserving, so taking the top `bits_z` magnitude bits
    quantizes only the TIE-BREAKING granularity (~2^-(bits_z-8) relative
    depth); equal-bucket gaussians compose in arbitrary order, exactly like
    the reference's radix sort on truncated bits would.
    """
    d = jnp.maximum(depth, 1e-30)  # culled pairs carry the sentinel tile
    zq = lax.shift_right_logical(
        lax.bitcast_convert_type(d, jnp.int32), 31 - bits_z)
    return (tile_key << bits_z) | zq


def dequantize_depth_key(key: jnp.ndarray, bits_z: int) -> jnp.ndarray:
    """Bucket-center depth back out of a fused key (~2^-(bits_z-8) rel)."""
    bits = (key & ((1 << bits_z) - 1)) << (31 - bits_z)
    bits = bits | (1 << (31 - bits_z - 1))  # half-bucket centering
    return lax.bitcast_convert_type(bits, jnp.float32)


def affine_depth_range(live: jnp.ndarray, depth: jnp.ndarray):
    """(dmin, inv_width) of the LIVE pairs' depth for affine key fusion."""
    big = jnp.float32(3e38)
    dmin = jnp.min(jnp.where(live, depth, big))
    dmax = jnp.max(jnp.where(live, depth, -big))
    inv_width = 1.0 / jnp.maximum(dmax - dmin, jnp.float32(1e-20))
    return dmin, inv_width


def fuse_tile_depth_key_affine(tile_key: jnp.ndarray, depth: jnp.ndarray,
                               bits_z: int, dmin: jnp.ndarray,
                               inv_width: jnp.ndarray) -> jnp.ndarray:
    """Affine fixed-point fused key: tile<<bits_z | round(u * (2^bits_z-1))
    with u = (depth - dmin)/(dmax - dmin) over the frame's LIVE pairs.

    Spends the key's depth bits LINEARLY over the scene's actual depth
    range instead of on truncated float bits (fuse_tile_depth_key): tie
    buckets shrink from ~2^-13 RELATIVE depth to ~2^-21 of the depth RANGE
    (~256x finer for typical scenes, beyond f32's own mantissa once the
    range is < 2^-2 of the magnitude). Measured effect (artifacts/
    r5_probe2.log E2, r5_probe3): same-bucket tie reordering — the r4
    sweep's 0.18 RGB cull-on/off deviation (VERDICT r4 item 2) — drops to
    the noise floor, at zero sort cost (a num_keys=2 total-order sort
    measured +3.1 ms). Monotone: u is affine in depth, f32 multiply and
    int truncation preserve order. Ties beyond this granularity compose in
    arbitrary order, exactly like the CUDA radix sort on equal keys
    (rasterizer_impl.cu:102-104).
    """
    u = jnp.clip((depth - dmin) * inv_width, 0.0, 1.0)
    # clamp AFTER the cast: for bits_z > 24, f32(2^bits_z - 1) rounds UP to
    # 2^bits_z, so u == 1.0 would otherwise overflow into the tile bits
    # (wrapping the deepest pair's zq to 0 — front of its tile)
    zq = jnp.minimum((u * jnp.float32((1 << bits_z) - 1) + 0.5)
                     .astype(jnp.int32), jnp.int32((1 << bits_z) - 1))
    return (tile_key << bits_z) | zq


def dequantize_depth_key_affine(key: jnp.ndarray, bits_z: int,
                                dmin: jnp.ndarray, inv_width: jnp.ndarray
                                ) -> jnp.ndarray:
    """Inverse of the affine key's quantization (error <= half a bucket =
    ~2^-22 of the live depth range — far inside any loss's sensitivity)."""
    zq = (key & ((1 << bits_z) - 1)).astype(jnp.float32)
    return dmin + zq / (jnp.float32((1 << bits_z) - 1) * inv_width)


def pack2_f16(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Round two f32 rows to f16 and pack them into one i32 sort row.

    The sort runs ~at memcpy speed over its payload bytes (PROFILE.md), so
    halving record bytes (f32 -> 16-bit) buys ~the measured 30%+ of the
    sort, and packing two halves per word also halves the ROW count. f16
    over bf16: these values are pure transport (never MXU inputs), so the
    11-bit mantissa (~5e-4 relative) is free precision — conic/opacity
    rounding error lands well under the 8-bit image quantum.
    """
    lo = lax.bitcast_convert_type(a.astype(jnp.float16), jnp.uint16)
    hi = lax.bitcast_convert_type(b.astype(jnp.float16), jnp.uint16)
    return (hi.astype(jnp.int32) << 16) | lo.astype(jnp.int32)


def unpack2_f16(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of pack2_f16 (values carry f16 rounding)."""
    lo = lax.bitcast_convert_type((w & 0xFFFF).astype(jnp.uint16),
                                  jnp.float16)
    hi = lax.bitcast_convert_type(
        lax.shift_right_logical(w, 16).astype(jnp.uint16), jnp.float16)
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def pack2_bf16(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two f32 rows -> one i32 row via bf16 halves.

    Used for the backward's GRADIENT rows, whose magnitudes span the full
    f32 exponent range (loss-scale dependent): bf16 keeps f32's range where
    f16 would overflow past 65504, at 8 bits of mantissa — per-pair
    rounding noise that stays ~0.4% relative through the (K, N) sum.
    Round-to-nearest via +0x8000 on the raw bits (carry propagates into
    the exponent exactly as bf16 RN requires). Non-finite inputs skip the
    rounding add (which would carry past the exponent and produce
    arbitrary finite bits): inf stays inf and NaN stays non-finite under
    bit truncation, so a loss spike under pack_records=True still
    propagates instead of being silently mangled (advisor r3)."""
    ar = lax.bitcast_convert_type(a, jnp.int32)
    br = lax.bitcast_convert_type(b, jnp.int32)
    ab = jnp.where(jnp.isfinite(a), ar + jnp.int32(0x8000), ar)
    bb = jnp.where(jnp.isfinite(b), br + jnp.int32(0x8000), br)
    lo = lax.shift_right_logical(ab, 16)
    hi = bb & jnp.int32(-65536)
    return hi | lo


def unpack2_bf16(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of pack2_bf16 (values carry truncation to bf16)."""
    lo = lax.bitcast_convert_type(w << 16, jnp.float32)
    hi = lax.bitcast_convert_type(w & jnp.int32(-65536), jnp.float32)
    return lo, hi


@functools.lru_cache(maxsize=None)
def _make_composite(num_tiles: int, grid_w: int, tile_h: int, tile_w: int,
                    chunk: int, n_chan: int, bits_z: int = 0,
                    quantized_depth: bool = False,
                    precision: str = "highest", power_impl: str = "vpu",
                    scan_impl: str = "matmul_split3",
                    pack_records: bool = False,
                    unsort_impl: str = "sort",
                    total_order: bool = False,
                    tile_batch: int = 1):
    """Build the custom_vjp'd sort+composite for one static configuration.

    bits_z > 0 selects the fused single-key sort; quantized_depth
    additionally drops the f32 depth payload row and feeds the kernel the
    dequantized key depth (values ~2^-(bits_z-8) relative — gradients are
    unchanged since d(dequant)/d(depth) ~= 1). pack_records transports the
    geometry/channel rows through the sort as packed f16 pairs (i32 rows,
    pack2_f16): x/y are made tile-relative first so f16's 11-bit mantissa
    covers the in-tile range (~1e-4 px at 16-px tiles) and the origin is
    restored from the sorted tile id; the vjp treats the f16 round-trip
    as identity, like quantized depth.
    """
    cv = n_chan + 2
    cv_pad = -(-cv // 8) * 8
    kw = dict(num_tiles=num_tiles, grid_w=grid_w, tile_h=tile_h,
              tile_w=tile_w, chunk=chunk, precision=precision,
              scan_impl=scan_impl, power_impl=power_impl)
    fwd_kw = dict(kw, tile_batch=tile_batch)  # bwd kernel stays 1-tile
    if power_impl == "mxu_fused":
        # fused-op is a FORWARD cell-pipeline optimization; the backward
        # keeps the proven mxu bilinear path (it differentiates the unfused
        # alpha formula through rows 0-5 — consistent up to the one f32
        # rounding of the forward's precomputed log2-opacity row)
        kw["power_impl"] = "mxu"
    pack = pack_records and bits_z > 0

    def _pack_rows(tile_key, geom, chan):
        vals = list(geom) + list(chan)
        tx = ((tile_key % grid_w) * tile_w).astype(jnp.float32)
        ty = ((tile_key // grid_w) * tile_h).astype(jnp.float32)
        vals[0] = vals[0] - tx
        vals[1] = vals[1] - ty
        if len(vals) % 2:
            vals.append(jnp.zeros_like(vals[0]))
        return tuple(pack2_f16(vals[2 * i], vals[2 * i + 1])
                     for i in range(len(vals) // 2))

    def _unpack_rows(sk, payload):
        vals = []
        for w_ in payload:
            a, b = unpack2_f16(w_)
            vals += [a, b]
        vals = vals[:6 + n_chan]
        stile = lax.shift_right_logical(sk, bits_z)
        vals[0] = vals[0] + ((stile % grid_w) * tile_w).astype(jnp.float32)
        vals[1] = vals[1] + ((stile // grid_w) * tile_h).astype(
            jnp.float32)
        return tuple(vals)

    def _prepare(tile_key, depth, pos, geom, chan, *, with_pos=True):
        """Sort + pack. with_pos=False (inference-only forward) drops the
        emission-position backpointer row from the sort — it exists solely
        for the backward's unsort, so pure renders save one payload row."""
        pos_t = (pos,) if with_pos else ()
        rows_payload = (_pack_rows(tile_key, geom, chan) if pack
                        else tuple(geom) + tuple(chan))
        if bits_z > 0:
            dmin, inv_w = affine_depth_range(tile_key < num_tiles, depth)
            key = fuse_tile_depth_key_affine(tile_key, depth, bits_z,
                                             dmin, inv_w)
            if quantized_depth:
                arrays = (key,) + pos_t + rows_payload
                s = lax.sort(arrays, num_keys=1, is_stable=False)
                sk = s[0]
                spos = s[1] if with_pos else None
                sd = dequantize_depth_key_affine(sk, bits_z, dmin, inv_w)
                payload = s[1 + len(pos_t):]
            else:
                # depth_mode "exact": exact depth VALUES ride as payload but
                # sub-bucket ties still break arbitrarily (num_keys=1).
                # depth_mode "total": the f32 depth is a SECONDARY sort key,
                # giving the CUDA reference's total front-to-back order
                # (rasterizer_impl.cu:102-104 keys on the full float bits) —
                # the fused key's zq is depth-monotone, so (key, depth) is
                # plain depth order within each tile. This closes the
                # cull-on/off tie-reordering deviation (VERDICT r4 item 2:
                # two valid orderings of same-bucket ties differed by up to
                # 0.18 RGB at the bench scene).
                arrays = (key, depth) + pos_t + rows_payload
                s = lax.sort(arrays, num_keys=2 if total_order else 1,
                             is_stable=False)
                sk, sd = s[0], s[1]
                spos = s[2] if with_pos else None
                payload = s[2 + len(pos_t):]
            if pack:
                payload = _unpack_rows(sk, payload)
            bounds = jnp.searchsorted(
                sk, (jnp.arange(num_tiles + 1, dtype=jnp.int32) << bits_z),
                side="left").astype(jnp.int32)
            starts, counts = bounds[:-1], bounds[1:] - bounds[:-1]
        else:
            arrays = (tile_key, depth) + pos_t + tuple(geom) + tuple(chan)
            s = lax.sort(arrays, num_keys=2, is_stable=False)
            st, sd = s[0], s[1]
            spos = s[2] if with_pos else None
            payload = s[2 + len(pos_t):]
            starts, counts = tile_ranges(st, num_tiles)
        ne = sd.shape[0]
        ne_pad = (-(-ne // chunk) + 1) * chunk  # +1 chunk DMA-overrun slack
        pad = ne_pad - ne
        # ONE merged record table (geom rows on top, value rows below) so
        # the kernels issue a single DMA per chunk
        rows = list(payload[:6])                   # x, y, ca, cb, cc, op
        if power_impl == "mxu_fused":
            # the fused forward's precomputed opacity rows (raster_fwd.py
            # chunk_logalpha_fused): one log2+min pass over the sorted
            # table replaces a per-CELL mul + 2 mins + mask select chain
            log_op = jnp.log2(jnp.maximum(rows[5], jnp.float32(2.0 ** -100)))
            from dynamic3dgaussians_tpu.ops.compositing import ALPHA_MAX
            rows += [log_op,
                     jnp.minimum(log_op, jnp.float32(np.log2(ALPHA_MAX)))]
        else:
            rows += [jnp.zeros_like(sd, jnp.float32)] * (GEOM_ROWS - 6)
        rows += list(payload[6:]) + [sd, jnp.ones_like(sd)]
        rows += [jnp.zeros_like(sd)] * (cv_pad - cv)
        rec_t = jnp.pad(jnp.stack(rows, 0), ((0, 0), (0, pad)))
        return rec_t, spos, starts, counts

    @jax.custom_vjp
    def composite(tile_key, depth, pos, geom, chan):
        # custom_vjp primal path: runs only when NOT being differentiated
        rec_t, _, starts, counts = _prepare(
            tile_key, depth, pos, geom, chan, with_pos=False)
        raw, _, _ = pallas_composite_tiles(rec_t, starts, counts,
                                           **fwd_kw)
        return raw

    def composite_fwd(tile_key, depth, pos, geom, chan):
        rec_t, spos, starts, counts = _prepare(tile_key, depth, pos,
                                               geom, chan)
        raw, log_t, n_active = pallas_composite_tiles(rec_t, starts,
                                                      counts, **fwd_kw)
        return raw, (rec_t, spos, starts, counts, log_t, n_active)

    def composite_bwd(res, d_raw):
        rec_t, spos, starts, counts, log_t, n_active = res
        d_out = pallas_composite_tiles_bwd(
            rec_t, starts, counts, n_active.reshape(-1), log_t,
            d_raw, **kw)
        ne = spos.shape[0]
        # Slots past the last real pair were never written by the kernel.
        n_real = starts[num_tiles - 1] + counts[num_tiles - 1]
        live = lax.broadcasted_iota(jnp.int32, (1, ne), 1)[0] < n_real
        z = jnp.zeros((), jnp.float32)
        from dynamic3dgaussians_tpu.ops.pallas.raster_fwd import GEOM_ROWS
        d_rows = [jnp.where(live, d_out[r, :ne], z) for r in range(6)]
        d_rows += [jnp.where(live, d_out[GEOM_ROWS + n_chan, :ne], z)]  # depth
        d_rows += [jnp.where(live, d_out[GEOM_ROWS + c, :ne], z)
                   for c in range(n_chan)]
        if pack:
            # gradient rows ride the unsort as packed bf16 pairs (range-
            # safe; see pack2_bf16) — halves the second sort's payload too.
            # unsort_impl "gather" replaces the payload sort entirely with
            # a 2-row argsort + packed-row gathers (cheaper iff a gather
            # costs less than carrying a payload row through lax.sort —
            # the sweep's gather probe decides the default).
            src = list(d_rows)
            if len(src) % 2:
                src.append(jnp.zeros_like(src[0]))
            pk = tuple(pack2_bf16(src[2 * i], src[2 * i + 1])
                       for i in range(len(src) // 2))
            if unsort_impl == "gather":
                iota = lax.broadcasted_iota(jnp.int32, (1, ne), 1)[0]
                perm = lax.sort((spos, iota), num_keys=1,
                                is_stable=False)[1]
                un_pk = tuple(w_[perm] for w_ in pk)
            else:
                un_pk = lax.sort((spos,) + pk, num_keys=1,
                                 is_stable=False)[1:]
            vals = []
            for w_ in un_pk:
                a, b = unpack2_bf16(w_)
                vals += [a, b]
            vals = vals[:7 + n_chan]
            d_geom = tuple(vals[0:6])
            d_depth = vals[6]
            d_chan = tuple(vals[7:])
        else:
            un = lax.sort((spos,) + tuple(d_rows), num_keys=1,
                          is_stable=False)
            d_geom = tuple(un[1:7])
            d_depth = un[7]
            d_chan = tuple(un[8:])
        return (_float0(spos), d_depth, _float0(spos), d_geom, d_chan)

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


def _untile(x, grid_h, grid_w, th, tw, h, w, c):
    img = x.reshape(grid_h, grid_w, th, tw, c).transpose(0, 2, 1, 3, 4)
    return img.reshape(grid_h * th, grid_w * tw, c)[:h, :w]


def render_sorted(h: int, w: int, proj: Projected, colors: jnp.ndarray,
                  opacity: jnp.ndarray, bg: jnp.ndarray, *,
                  tile_h: int = 16, tile_w: int = 16, chunk: int = 128,
                  max_tiles_per_gaussian: int = 8,
                  fused_key: bool = True, depth_mode: str = "quantized",
                  precision: str = "highest", exact_cull: bool = True,
                  enum_cap: int = 0, power_impl: str = "vpu",
                  scan_impl: str = "matmul_split3",
                  pack_records: bool = False, unsort_impl: str = "sort",
                  tile_batch: int = 1
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray]:
    """Differentiable sorted-pair render.

    Args:
      proj: Projected primitives (flat fields).
      colors: (N, C) linear channels (RGB + any extra channels).
      opacity: (N,) activated opacity.
      bg: (C,) background added as bg * T_final per channel.
      exact_cull: lossless per-(gaussian, tile) alpha-bound culling at
        emission (see binning.emit_pairs) — K then caps passing tiles, not
        rect tiles. enum_cap sizes the tested rect window (0 = auto).
      power_impl: forward kernel alpha-power evaluation ("vpu" elementwise
        or "mxu" bilinear-form matmul — raster_fwd.py).

    Returns:
      (channels (H, W, C), depth (H, W), alpha (H, W), n_dropped_rect).
    """
    grid_h, grid_w = -(-h // tile_h), -(-w // tile_w)
    num_tiles = grid_h * grid_w
    n = opacity.shape[0]
    n_chan = colors.shape[-1]
    k_cap = max_tiles_per_gaussian

    cap = (enum_cap or max(16, 2 * k_cap)) if exact_cull else 0
    tile_key, _, n_dropped_rect = emit_pairs(
        proj, tile_h, tile_w, grid_h, grid_w, k_cap,
        opacity=opacity if exact_cull else None, enum_cap=cap)

    def bcast(v):
        return jnp.broadcast_to(v[None, :], (k_cap, n)).reshape(-1)

    # Conic rows are pre-scaled by log2(e): the kernels run transmittance in
    # base-2 log space (hardware-native exp2/log2, raster_fwd.py). This
    # scaling sits OUTSIDE the custom_vjp, so autodiff chains the conic
    # gradients back through it automatically.
    log2e = jnp.float32(1.4426950408889634)
    geom = (bcast(proj.x2d), bcast(proj.y2d), bcast(proj.conic_a * log2e),
            bcast(proj.conic_b * log2e), bcast(proj.conic_c * log2e),
            bcast(opacity))
    depth = bcast(proj.depth)
    colors_t = colors.T                            # (C, N) one relayout pass
    chan = tuple(bcast(colors_t[c]) for c in range(n_chan))
    pos = lax.broadcasted_iota(jnp.int32, (1, k_cap * n), 1)[0]

    bits_z = depth_key_bits(num_tiles) if fused_key else 0
    composite = _make_composite(num_tiles, grid_w, tile_h, tile_w, chunk,
                                n_chan, bits_z,
                                bits_z > 0 and depth_mode == "quantized",
                                precision, power_impl, scan_impl,
                                pack_records, unsort_impl,
                                total_order=depth_mode == "total",
                                tile_batch=tile_batch)
    raw = composite(tile_key, depth, pos, geom, chan)

    alpha_t = raw[..., n_chan + 1]
    depth_t = raw[..., n_chan]
    chan_t = raw[..., :n_chan] + (1.0 - alpha_t[..., None]) * bg
    channels = _untile(chan_t, grid_h, grid_w, tile_h, tile_w, h, w, n_chan)
    depth_img = _untile(depth_t[..., None], grid_h, grid_w, tile_h, tile_w,
                        h, w, 1)[..., 0]
    alpha_img = _untile(alpha_t[..., None], grid_h, grid_w, tile_h, tile_w,
                        h, w, 1)[..., 0]
    return channels, depth_img, alpha_img, n_dropped_rect
