"""Canonical differentiable render API + the tiled XLA renderer.

This is the framework's single render entry point, unifying the reference's
drifted rasterizer ABIs (SURVEY.md §2.4: 3/4/5-tuple unpacks across scripts)
into one structured result:

    render(cam, means3d, colors, opacity, scales, rotations, ...)
        -> RenderOutput(rgb, extra, depth, alpha, radii, stats)

Capability map to the reference stack:
  * GaussianRasterizer.__call__ (…/diff_gaussian_rasterization/__init__.py:
    194-245) -> `render` (one call renders RGB + seg + semantic features
    together via `extra_channels`, removing the 2x second-render overhead the
    reference README acknowledges at README.md:88-89).
  * CUDA forward pipeline N1->N2->N3 (rasterizer_impl.cu:198-346) ->
    `project` + sorted-pair emission + Pallas tile kernel
    (ops/sorted_raster.py) for method="pallas" (the production TPU path), or
    the pure-XLA `_gather_and_composite` for method="tiled".
  * CUDA backward N4/N5 (backward.cu) -> hand-written Pallas backward kernel
    (ops/pallas/raster_bwd.py) on the pallas path; plain autodiff on the XLA
    paths. Both are race-free and deterministic where the reference uses
    atomicAdd (SURVEY.md §5.2).
  * `label` gradient gating (__init__.py:159-173) -> `grad_mask`.
  * means2D densification probe (helpers.py:105) -> `mean2d_probe_ndc`.

Capacity knobs in RasterConfig keep every shape static (XLA requirement);
the pallas path has no pair capacity at all (every gaussian owns K =
max_tiles_per_gaussian emission slots); rect-cap overflow is counted in
`stats`, never silent.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from dynamic3dgaussians_tpu.ops import compositing
from dynamic3dgaussians_tpu.ops.binning import bin_gaussians
from dynamic3dgaussians_tpu.ops.camera import Camera
from dynamic3dgaussians_tpu.ops.projection import Projected, project
from dynamic3dgaussians_tpu.ops.rasterize_ref import render_primitives_reference
from dynamic3dgaussians_tpu.ops.sh import sh_to_color
from dynamic3dgaussians_tpu.ops.sorted_raster import render_sorted


@flax.struct.dataclass
class RasterConfig:
    """Static rasterizer capacities/tiling (all fields are trace-time)."""

    tile_h: int = flax.struct.field(pytree_node=False, default=16)
    tile_w: int = flax.struct.field(pytree_node=False, default=16)
    chunk: int = flax.struct.field(pytree_node=False, default=128)
    # Per-gaussian emission slots (tile-rect cap); the only capacity the
    # pallas path has. Overflow (huge gaussians) is counted, never silent.
    max_tiles_per_gaussian: int = flax.struct.field(pytree_node=False,
                                                    default=8)
    # Pallas path sort strategy: fuse (tile, depth) into ONE i32 key when the
    # tile grid fits (the CUDA reference's 64-bit key trick in 32 bits,
    # rasterizer_impl.cu:102-104); "quantized" depth_mode additionally drops
    # the f32 depth payload row and reads bucket-center depth back out of the
    # key (~2^-13 relative on a 920-tile grid; ordering ties quantize the
    # same way the reference's truncated-bit radix sort would). depth_mode
    # "exact" keeps bit-exact depth values at one extra sorted row (sub-
    # bucket ties still break arbitrarily); "total" additionally makes that
    # row a SECONDARY sort key — the CUDA reference's total front-to-back
    # order (full float-bit keys, rasterizer_impl.cu:102-104).
    fused_key: bool = flax.struct.field(pytree_node=False, default=True)
    depth_mode: str = flax.struct.field(pytree_node=False,
                                        default="quantized")
    # MXU precision of the compositing matmuls: "highest" (bf16x6,
    # bit-tight vs f32) or "default" (single-pass bf16). Mosaic lowers no
    # intermediate tier, so "high" aliases "highest"; the transmittance
    # prefix has its own fast path (raster_fwd.lane_inclusive_scan
    # "matmul_split3", the default scan implementation).
    kernel_precision: str = flax.struct.field(pytree_node=False,
                                              default="highest")
    # Lossless emission culling (pallas path): drop (gaussian, tile) pairs
    # whose max possible alpha over the tile is under the kernel's 1/255
    # gate, rank-compacting survivors into the K slots (binning.emit_pairs).
    # emit_enum_cap sizes the tested rect window (0 = auto: max(16, 2K)).
    exact_cull: bool = flax.struct.field(pytree_node=False, default=True)
    emit_enum_cap: int = flax.struct.field(pytree_node=False, default=0)
    # Forward-kernel alpha power evaluation: "vpu" (elementwise quadratic
    # form), "mxu" (bilinear-form matmul, raster_fwd.tile_pixel_feats) or
    # "mxu_fused" (mxu power + precomputed log2-opacity rows + fused
    # alpha*T exp2 — the minimal-VPU-op cell pipeline; backward stays mxu).
    power_impl: str = flax.struct.field(pytree_node=False, default="vpu")
    # Transmittance prefix-scan implementation (raster_fwd.
    # lane_inclusive_scan): "matmul_split3" | "matmul_block128" (chunk>128)
    # | "matmul_highest" | "roll_scan".
    scan_impl: str = flax.struct.field(pytree_node=False,
                                       default="matmul_split3")
    # Transport geometry/channel rows through the sort as packed bf16
    # pairs (sorted_raster.pack2_bf16): ~half the payload bytes and rows.
    # Values reach the kernel with bf16 rounding (x/y tile-relative, so
    # ~0.06 px); below the 8-bit image quantum, off by default for
    # bit-strict golden parity.
    pack_records: bool = flax.struct.field(pytree_node=False, default=False)
    # Backward pair->gaussian unsort: "sort" (payload sort by emission
    # position) or "gather" (2-row argsort + packed-row gathers; only
    # active with pack_records).
    unsort_impl: str = flax.struct.field(pytree_node=False, default="sort")
    # Tiles composited per forward-kernel grid step: amortizes the ~2 us
    # fixed per-step cost and lets every tile's first record chunk be
    # DMA-prefetched a whole tile walk ahead (raster_fwd._kernel).
    tile_batch: int = flax.struct.field(pytree_node=False, default=1)
    # XLA "tiled" oracle path only:
    max_per_tile: int = flax.struct.field(pytree_node=False, default=1024)
    pairs_per_gaussian: int = flax.struct.field(pytree_node=False, default=8)

    def pair_capacity(self, n: int) -> int:
        cap = self.pairs_per_gaussian * n
        return max(1024, -(-cap // 1024) * 1024)


@flax.struct.dataclass
class RenderOutput:
    rgb: jnp.ndarray                      # (H, W, 3)
    depth: jnp.ndarray                    # (H, W) sum z*alpha*T (unnormalized)
    alpha: jnp.ndarray                    # (H, W) sum alpha*T
    radii: jnp.ndarray                    # (N,) int32 screen radii, 0=culled
    extra: Optional[jnp.ndarray] = None   # (H, W, E) seg/feature channels
    # diagnostics (int32 scalars); zero in a well-capacitated render
    n_dropped_capacity: Optional[jnp.ndarray] = None
    n_dropped_rect: Optional[jnp.ndarray] = None
    n_dropped_tile_overflow: Optional[jnp.ndarray] = None

    @property
    def seen(self) -> jnp.ndarray:
        """Per-gaussian visibility (reference: radii > 0)."""
        return self.radii > 0


def _grad_gate(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero gradients for gaussians where mask==0, keep values intact.

    Reproduces the python-side `label` gradient multiply of the reference
    binding (__init__.py:159-173) used to freeze static gaussians.
    """
    m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)).astype(x.dtype)
    return x * m + jax.lax.stop_gradient(x * (1.0 - m))


def _untile(x, grid_h, grid_w, th, tw, h, w, c):
    img = x.reshape(grid_h, grid_w, th, tw, c).transpose(0, 2, 1, 3, 4)
    return img.reshape(grid_h * th, grid_w * tw, c)[:h, :w]


def _record_table(proj: Projected, colors, opacity):
    """Pack all per-gaussian render fields into ONE (N, F) table.

    (XLA tiled path only.) One wide row-gather beats a dozen per-field
    gathers; the pallas path avoids gathers entirely via payload sorts.
    Layout: [0:2] mean2d, [2:5] conic, [5] opacity (zeroed for culled
    gaussians), [6:6+C] channels, [6+C] view depth, [7+C] ones — padded to 8.
    """
    op = jnp.where(proj.valid, opacity, 0.0)
    cols = [proj.mean2d, proj.conic, op[:, None], colors,
            proj.depth[:, None], jnp.ones_like(op)[:, None]]
    table = jnp.concatenate(cols, axis=-1)
    pad = (-table.shape[-1]) % 8
    if pad:
        table = jnp.pad(table, ((0, 0), (0, pad)))
    return table


def _gather_and_composite(h: int, w: int, proj: Projected, colors, opacity,
                          bg, cfg: RasterConfig, bins, tile_sharding=None):
    """XLA tile compositing given precomputed bins -> (channels, depth, alpha).

    tile_sharding: optional jax.sharding.NamedSharding striping the tile axis
    across devices (pixel/tile sharding, SURVEY.md §7 step 9 stage B) —
    projection/binning stay replicated, the heavy per-tile compositing is
    constraint-sharded and XLA inserts the gather of the final image.
    """
    th, tw = cfg.tile_h, cfg.tile_w
    grid_h, grid_w = -(-h // th), -(-w // tw)
    n_chan = colors.shape[-1]

    mt = -(-cfg.max_per_tile // cfg.chunk) * cfg.chunk
    num_tiles = grid_h * grid_w
    slot = jnp.arange(mt, dtype=jnp.int32)
    idx = bins.tile_starts[:, None] + slot[None, :]               # (T, MT)
    in_list = slot[None, :] < jnp.minimum(bins.tile_counts, mt)[:, None]
    ids = bins.gaussian_ids[jnp.clip(idx, 0, bins.gaussian_ids.shape[0] - 1)]
    if tile_sharding is not None:
        ids = jax.lax.with_sharding_constraint(ids, tile_sharding)

    rec = _record_table(proj, colors, opacity)[ids]               # (T, MT, F)
    g_mean2d = rec[..., 0:2]
    g_conic = rec[..., 2:5]
    g_op = jnp.where(in_list, rec[..., 5], 0.0)
    g_vals = rec[..., 6:6 + n_chan + 2]                           # (T, MT, C+2)
    g_valid = in_list

    # Tile-local pixel coordinates (row-major within the tile).
    ty = jnp.arange(num_tiles, dtype=jnp.int32) // grid_w
    tx = jnp.arange(num_tiles, dtype=jnp.int32) % grid_w
    ly = jnp.arange(th, dtype=jnp.float32)
    lx = jnp.arange(tw, dtype=jnp.float32)
    lyy, lxx = jnp.meshgrid(ly, lx, indexing="ij")
    px = tx[:, None].astype(jnp.float32) * tw + lxx.reshape(-1)[None, :]
    py = ty[:, None].astype(jnp.float32) * th + lyy.reshape(-1)[None, :]
    n_pix = th * tw

    batched_alpha = jax.vmap(compositing.chunk_alpha)
    batched_comp = jax.vmap(compositing.composite_chunk)

    def body(carry, k):
        T, acc = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, k * cfg.chunk,
                                                    cfg.chunk, 1)
        alpha = batched_alpha(sl(g_mean2d), sl(g_conic), sl(g_op),
                              sl(g_valid), px, py)
        T, acc = batched_comp(T, acc, alpha, sl(g_vals))
        return (T, acc), None

    T0 = jnp.ones((num_tiles, n_pix), jnp.float32)
    acc0 = jnp.zeros((num_tiles, n_pix, n_chan + 2), jnp.float32)
    (T, acc), _ = jax.lax.scan(jax.checkpoint(body), (T0, acc0),
                               jnp.arange(mt // cfg.chunk))

    channels, depth_img, alpha_img = jax.vmap(
        lambda t, a: compositing.finalize(t, a, bg))(T, acc)

    return (_untile(channels, grid_h, grid_w, th, tw, h, w, n_chan),
            _untile(depth_img[..., None], grid_h, grid_w, th, tw, h, w,
                    1)[..., 0],
            _untile(alpha_img[..., None], grid_h, grid_w, th, tw, h, w,
                    1)[..., 0])


def _composite_tiles(cam: Camera, proj: Projected, colors, opacity, bg,
                     cfg: RasterConfig, tile_sharding=None,
                     use_pallas: bool = False):
    """Tile-binned compositing over the whole image (the hot path)."""
    h, w = cam.height, cam.width
    th, tw = cfg.tile_h, cfg.tile_w
    grid_h, grid_w = -(-h // th), -(-w // tw)
    n = opacity.shape[0]
    zero = jnp.int32(0)

    if use_pallas:
        op = jnp.where(proj.valid, opacity, 0.0)
        channels, depth_img, alpha_img, n_dropped_rect = render_sorted(
            h, w, proj, colors, op, bg, tile_h=th, tile_w=tw,
            chunk=cfg.chunk,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            fused_key=cfg.fused_key, depth_mode=cfg.depth_mode,
            precision=cfg.kernel_precision, exact_cull=cfg.exact_cull,
            enum_cap=cfg.emit_enum_cap, power_impl=cfg.power_impl,
            scan_impl=cfg.scan_impl, pack_records=cfg.pack_records,
            unsort_impl=cfg.unsort_impl, tile_batch=cfg.tile_batch)
        return {"channels": channels, "depth": depth_img, "alpha": alpha_img,
                "n_dropped_capacity": zero, "n_dropped_rect": n_dropped_rect,
                "n_dropped_tile_overflow": zero}

    bins = bin_gaussians(proj, th, tw, grid_h, grid_w,
                         pair_capacity=cfg.pair_capacity(n),
                         max_tiles_per_gaussian=cfg.max_tiles_per_gaussian)
    mt = -(-cfg.max_per_tile // cfg.chunk) * cfg.chunk
    n_tile_overflow = jnp.sum(jnp.maximum(bins.tile_counts - mt, 0))
    channels, depth_img, alpha_img = _gather_and_composite(
        h, w, proj, colors, opacity, bg, cfg, bins,
        tile_sharding=tile_sharding)
    return {
        "channels": channels,
        "depth": depth_img,
        "alpha": alpha_img,
        "n_dropped_capacity": bins.n_dropped_capacity,
        "n_dropped_rect": bins.n_dropped_rect,
        "n_dropped_tile_overflow": n_tile_overflow.astype(jnp.int32),
    }


def render(cam: Camera,
           means3d: jnp.ndarray,
           colors: jnp.ndarray,
           opacity: jnp.ndarray,
           scales: Optional[jnp.ndarray] = None,
           rotations: Optional[jnp.ndarray] = None,
           *,
           extra_channels: Optional[jnp.ndarray] = None,
           bg: Optional[jnp.ndarray] = None,
           sh: Optional[jnp.ndarray] = None,
           sh_degree: int = 0,
           cov3d_precomp: Optional[jnp.ndarray] = None,
           scale_modifier: float = 1.0,
           mean2d_probe_ndc: Optional[jnp.ndarray] = None,
           grad_mask: Optional[jnp.ndarray] = None,
           method: str = "auto",
           config: Optional[RasterConfig] = None,
           tile_sharding=None) -> RenderOutput:
    """Differentiable gaussian-splat render (the framework's L1 boundary).

    Args:
      cam: Camera (height/width static).
      means3d: (N, 3) world centers.
      colors: (N, 3) linear RGB (colors_precomp path) — ignored if `sh` given.
      opacity: (N,) or (N, 1) activated opacities in [0, 1].
      scales: (N, 3) activated scales (required unless cov3d_precomp).
      rotations: (N, 4) unit wxyz quaternions (required unless cov3d_precomp).
      extra_channels: (N, E) additional linear channels composited in the same
        pass (segmentation colors, 32-d semantic features, ...).
      bg: (3,) background color for the RGB channels (default black). Extra
        channels always composite over zero (the reference's OOB-bg-read on
        feature channels is a bug we fix — SURVEY.md §2.4).
      sh: optional (N, K, 3) SH coefficients; evaluated at `sh_degree`.
      mean2d_probe_ndc: optional (N, 2) zeros; gradient = densification stats.
      grad_mask: optional (N,) {0,1}; zeroes all parameter gradients of masked
        gaussians (the reference's `label` mechanism).
      method: "auto" (pallas on TPU, tiled elsewhere), "pallas" (Pallas
        fwd+bwd kernels), "tiled" (pure-XLA), or "reference" (O(N*H*W)
        oracle).

    Returns:
      RenderOutput.
    """
    cfg = config or RasterConfig()
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "tiled"
    opacity = opacity.reshape(opacity.shape[0], -1)[:, 0]
    if sh is not None:
        colors = sh_to_color(sh_degree, sh, means3d, cam.cam_center)
    if grad_mask is not None:
        means3d = _grad_gate(means3d, grad_mask)
        colors = _grad_gate(colors, grad_mask)
        opacity = _grad_gate(opacity, grad_mask)
        if scales is not None:
            scales = _grad_gate(scales, grad_mask)
        if rotations is not None:
            rotations = _grad_gate(rotations, grad_mask)
        if extra_channels is not None:
            extra_channels = _grad_gate(extra_channels, grad_mask)

    all_chan = colors if extra_channels is None else jnp.concatenate(
        [colors, extra_channels], axis=-1)
    n_rgb = colors.shape[-1]
    full_bg = jnp.zeros((all_chan.shape[-1],), jnp.float32)
    if bg is not None:
        full_bg = full_bg.at[:n_rgb].set(jnp.asarray(bg, jnp.float32))

    proj = project(means3d, scales, rotations, cam,
                   scale_modifier=scale_modifier,
                   cov3d_precomp=cov3d_precomp,
                   mean2d_probe_ndc=mean2d_probe_ndc)

    if method == "reference":
        out = render_primitives_reference(cam, proj, all_chan, opacity,
                                          bg=full_bg, chunk=cfg.chunk,
                                          tile_h=cfg.tile_h, tile_w=cfg.tile_w)
        out.setdefault("n_dropped_capacity", jnp.int32(0))
        out.setdefault("n_dropped_rect", jnp.int32(0))
        out.setdefault("n_dropped_tile_overflow", jnp.int32(0))
    elif method == "tiled":
        out = _composite_tiles(cam, proj, all_chan, opacity, full_bg, cfg,
                               tile_sharding=tile_sharding)
    elif method == "pallas":
        out = _composite_tiles(cam, proj, all_chan, opacity, full_bg, cfg,
                               use_pallas=True)
    else:
        raise ValueError(f"unknown render method: {method}")

    channels = out["channels"]
    return RenderOutput(
        rgb=channels[..., :n_rgb],
        extra=None if extra_channels is None else channels[..., n_rgb:],
        depth=out["depth"],
        alpha=out["alpha"],
        radii=proj.radius,
        n_dropped_capacity=out["n_dropped_capacity"],
        n_dropped_rect=out["n_dropped_rect"],
        n_dropped_tile_overflow=out["n_dropped_tile_overflow"],
    )
