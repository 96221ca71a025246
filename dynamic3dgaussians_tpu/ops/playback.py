"""Cached-order playback rendering: the trained-scene fps path.

The reference's headline 800-FPS number is its *visualizer* loop — rendering
a trained scene along a smooth camera path (visualize_org.py:46-65, one
CUDA rasterize per frame). On TPU the full per-frame pipeline re-pays
emission + a K*N-pair payload sort every frame, which the r2 ablation
measured at ~40% of the frame. But along a smooth orbit (or a timeline
playback from a fixed rig camera) the depth order and tile membership of
the splats change *slowly*: re-deriving them every frame buys nothing
visible between adjacent frames.

So playback splits the frame into:

  * KEY frames (`build_cache`, every `resort_every`-th frame): run emission
    and the cheapest possible sort — key + position row only, no payload —
    and keep the *order*: a sorted-position -> gaussian-id gather index
    (``perm % N``), per-tile segment starts/counts.
  * CACHED frames (`render_playback`): project the gaussians fresh
    (geometry, colors, opacity are all CURRENT-frame values), then gather
    the per-gaussian rows straight into sorted pair order through the
    cached index — one (rows, N)-table gather by NE indices replaces
    emission + the payload sort. The compositing kernel and its inputs are
    otherwise identical to the exact path.

What is stale on a cached frame (and only this):
  * the depth ORDER within a tile (values are fresh; two splats that swapped
    depth since the key frame composite in the old order),
  * tile MEMBERSHIP (a splat is composited into the tiles its key-frame
    footprint touched; after ~a tile of image motion, re-sort),
  * frustum/alpha CULL decisions from the key frame.

All three decay to zero as `resort_every -> 1`; `render_playback` with a
fresh cache is numerically the exact pallas render (modulo the f16 gather
transport, under one 8-bit quantum). tools/bench_r3_variants + bench.py
measure the honest pair (exact per-frame fps, playback fps + per-frame
image delta at the benchmarked resort interval).

Inference-only: no custom_vjp (training always re-sorts — gradients need
exact emission).

Batching caveat (compiled TPU): `jax.vmap(render_playback)` over cameras
with a SHARED cache does not lower — the batched record table reaches the
pallas kernel in memory-space ANY with a non-trivial index map, which
Mosaic rejects. Render cached frames sequentially (the kernel saturates
the chip per frame anyway), or vmap `build_cache` too so every operand
carries the batch axis.
"""

from __future__ import annotations

from typing import Optional

import flax
import jax
import jax.numpy as jnp
from jax import lax

from dynamic3dgaussians_tpu.ops.binning import emit_pairs, tile_ranges
from dynamic3dgaussians_tpu.ops.camera import Camera
from dynamic3dgaussians_tpu.ops.pallas.raster_fwd import (
    GEOM_ROWS, pallas_composite_tiles)
from dynamic3dgaussians_tpu.ops.projection import project
from dynamic3dgaussians_tpu.ops.rasterize import (RasterConfig, RenderOutput,
                                                  _untile)
from dynamic3dgaussians_tpu.ops.sorted_raster import (depth_key_bits,
                                                      fuse_tile_depth_key,
                                                      pack2_f16, unpack2_f16)

LOG2E = 1.4426950408889634


@flax.struct.dataclass
class PlaybackCache:
    """Frozen sort order + tile segmentation from a key frame."""

    gidx: jnp.ndarray       # (NE,) i32 sorted-pair -> gaussian id
    starts: jnp.ndarray     # (num_tiles,) i32 segment starts
    counts: jnp.ndarray     # (num_tiles,) i32 segment lengths
    n_dropped_rect: jnp.ndarray  # i32 emission diagnostics at the key frame


def build_cache(cam: Camera, means3d: jnp.ndarray, opacity: jnp.ndarray,
                scales: jnp.ndarray, rotations: jnp.ndarray, *,
                config: Optional[RasterConfig] = None,
                scale_modifier: float = 1.0) -> PlaybackCache:
    """Key-frame pass: emission + a key/pos-only sort (no payload rows)."""
    cfg = config or RasterConfig()
    h, w = cam.height, cam.width
    grid_h, grid_w = -(-h // cfg.tile_h), -(-w // cfg.tile_w)
    num_tiles = grid_h * grid_w
    proj = project(means3d, scales, rotations, cam,
                   scale_modifier=scale_modifier)
    opacity = opacity.reshape(opacity.shape[0], -1)[:, 0]
    op = jnp.where(proj.valid, opacity, 0.0)
    k_cap = cfg.max_tiles_per_gaussian
    cap = ((cfg.emit_enum_cap or max(16, 2 * k_cap))
           if cfg.exact_cull else 0)
    tile_key, _, n_dropped = emit_pairs(
        proj, cfg.tile_h, cfg.tile_w, grid_h, grid_w, k_cap,
        opacity=op if cfg.exact_cull else None, enum_cap=cap)
    n = opacity.shape[0]
    pos = lax.broadcasted_iota(jnp.int32, (1, k_cap * n), 1)[0]
    bits_z = depth_key_bits(num_tiles) if cfg.fused_key else 0
    depth = jnp.broadcast_to(proj.depth[None, :],
                             (k_cap, n)).reshape(-1)
    if bits_z > 0:
        key = fuse_tile_depth_key(tile_key, depth, bits_z)
        sk, spos = lax.sort((key, pos), num_keys=1, is_stable=False)
        bounds = jnp.searchsorted(
            sk, (jnp.arange(num_tiles + 1, dtype=jnp.int32) << bits_z),
            side="left").astype(jnp.int32)
        starts, counts = bounds[:-1], bounds[1:] - bounds[:-1]
    else:
        st, _, spos = lax.sort((tile_key, depth, pos), num_keys=2,
                               is_stable=False)
        starts, counts = tile_ranges(st, num_tiles)
    return PlaybackCache(gidx=spos % n, starts=starts, counts=counts,
                         n_dropped_rect=n_dropped)


def render_playback(cam: Camera, means3d: jnp.ndarray, colors: jnp.ndarray,
                    opacity: jnp.ndarray, scales: jnp.ndarray,
                    rotations: jnp.ndarray, cache: PlaybackCache, *,
                    bg: Optional[jnp.ndarray] = None,
                    extra_channels: Optional[jnp.ndarray] = None,
                    config: Optional[RasterConfig] = None,
                    scale_modifier: float = 1.0) -> RenderOutput:
    """Render one frame through a cached sort order (no emission, no sort).

    Geometry/colors/opacity are current-frame values; only the pair ORDER
    and tile segments come from the cache (see module docstring for the
    staleness model). Gather transport: x/y/depth ride f32, the
    conic/opacity/channel rows ride as packed f16 pairs (pack2_f16) —
    ~35% fewer gathered words, error under one 8-bit quantum.
    """
    cfg = config or RasterConfig()
    h, w = cam.height, cam.width
    grid_h, grid_w = -(-h // cfg.tile_h), -(-w // cfg.tile_w)
    num_tiles = grid_h * grid_w
    chunk = cfg.chunk
    proj = project(means3d, scales, rotations, cam,
                   scale_modifier=scale_modifier)
    opacity = opacity.reshape(opacity.shape[0], -1)[:, 0]
    op = jnp.where(proj.valid, opacity, 0.0)
    all_chan = colors if extra_channels is None else jnp.concatenate(
        [colors, extra_channels], axis=-1)
    n_chan = all_chan.shape[-1]
    n_rgb = colors.shape[-1]
    full_bg = jnp.zeros((n_chan,), jnp.float32)
    if bg is not None:
        full_bg = full_bg.at[:n_rgb].set(jnp.asarray(bg, jnp.float32))

    # per-gaussian rows (length N), packed for the gather
    log2e = jnp.float32(LOG2E)
    chan_t = all_chan.T
    pack_src = [proj.conic_a * log2e, proj.conic_b * log2e,
                proj.conic_c * log2e, op] + [chan_t[c]
                                             for c in range(n_chan)]
    if len(pack_src) % 2:
        pack_src.append(jnp.zeros_like(op))
    packed = [pack2_f16(pack_src[2 * i], pack_src[2 * i + 1])
              for i in range(len(pack_src) // 2)]
    gid = cache.gidx
    ne = gid.shape[0]

    def g(row):
        return jnp.take(row, gid, axis=0)

    xs, ys, ds = g(proj.x2d), g(proj.y2d), g(proj.depth)
    up = []
    for wrd in packed:
        a, b = unpack2_f16(g(wrd))
        up += [a, b]
    ca, cb, cc, opg = up[0], up[1], up[2], up[3]
    chang = up[4:4 + n_chan]

    cv = n_chan + 2
    cv_pad = -(-cv // 8) * 8
    ne_pad = (-(-ne // chunk) + 1) * chunk
    pad = ne_pad - ne
    rows = [xs, ys, ca, cb, cc, opg]
    rows += [jnp.zeros_like(ds)] * (GEOM_ROWS - 6)
    rows += chang + [ds, jnp.ones_like(ds)]
    rows += [jnp.zeros_like(ds)] * (cv_pad - cv)
    rec_t = jnp.pad(jnp.stack(rows, 0), ((0, 0), (0, pad)))

    raw, _, _ = pallas_composite_tiles(
        rec_t, cache.starts, cache.counts, num_tiles=num_tiles,
        grid_w=grid_w, tile_h=cfg.tile_h, tile_w=cfg.tile_w, chunk=chunk,
        precision=cfg.kernel_precision, scan_impl=cfg.scan_impl,
        power_impl=cfg.power_impl)
    alpha_t = raw[..., n_chan + 1]
    depth_t = raw[..., n_chan]
    chan_img = raw[..., :n_chan] + (1.0 - alpha_t[..., None]) * full_bg
    th, tw = cfg.tile_h, cfg.tile_w
    channels = _untile(chan_img, grid_h, grid_w, th, tw, h, w, n_chan)
    depth_img = _untile(depth_t[..., None], grid_h, grid_w, th, tw, h, w,
                        1)[..., 0]
    alpha_img = _untile(alpha_t[..., None], grid_h, grid_w, th, tw, h, w,
                        1)[..., 0]
    zero = jnp.int32(0)
    return RenderOutput(
        rgb=channels[..., :n_rgb],
        extra=None if extra_channels is None else channels[..., n_rgb:],
        depth=depth_img, alpha=alpha_img, radii=proj.radius,
        n_dropped_capacity=zero, n_dropped_rect=cache.n_dropped_rect,
        n_dropped_tile_overflow=zero)
