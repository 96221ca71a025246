"""Gaussian-sharded rendering: depth-slab partitioning + ordered merge.

Stage C of the scaling plan (SURVEY.md §7 step 9 / §5.7): when the gaussian
count (not the pixel count) is the bottleneck, split ONE render across the
device mesh by partitioning gaussians into per-device DEPTH SLABS. Depth
disjointness is what makes the cross-device merge exact: with slabs ordered
front-to-back, per-pixel compositing obeys

    C_total = sum_d ( prod_{e<d} T_e ) * C_d          (premultiplied channels)
    T_total = prod_d T_d

i.e. an ordered scan over the mesh axis. We realize the scan with ONE
all_gather of the per-device log-transmittance images (tiny: H*W floats per
device) to form the exclusive prefix locally, followed by ONE psum of the
prefix-weighted partial accumulators — the same communication the classic
ppermute ring-compositing pass performs in K-1 latency-bound steps, but in
two bandwidth-bound collectives over ICI. Transmittances travel in LOG space
(no 1-alpha cancellation across devices).

Each device renders only its ~N/K slab through the full production pipeline
(projection -> sorted-pair binning -> Pallas tiles), so binning sort and
kernel work scale ~1/K per device. Parameters enter replicated (HBM is not
the scarce resource at the reference's 200-300k gaussian scale — BASELINE
north star); the per-frame slab assignment is a device-local argsort over
view depth, no parameter redistribution traffic at all.

The reference has no analogue (single-GPU CUDA only, SURVEY.md §1).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dynamic3dgaussians_tpu.ops.camera import Camera
from dynamic3dgaussians_tpu.ops.rasterize import RasterConfig, render


def make_depth_sharded_render(cam: Camera, mesh: Mesh, axis: str = "model",
                              config: Optional[RasterConfig] = None,
                              method: str = "auto"):
    """Build a jitted sharded renderer over `mesh[axis]`.

    Returns fn(means3d, colors, opacity, scales, rotations, bg=None) ->
    dict(rgb, depth, alpha) fully composited, replicated on every device.
    The gaussian count must be >= the axis size.
    """
    k = mesh.shape[axis]

    def local_render(means, colors, opacity, scales, rotations, bg):
        d = jax.lax.axis_index(axis)
        n = means.shape[0]
        per = -(-n // k)

        # per-frame slab assignment: view depth -> argsort -> my row range
        V = cam.w2c
        depth = (V[2, 0] * means[:, 0] + V[2, 1] * means[:, 1]
                 + V[2, 2] * means[:, 2] + V[2, 3])
        order = jnp.argsort(jnp.where(depth > cam.near, depth, jnp.inf))
        order = jnp.pad(order, (0, per * k - n), constant_values=n - 1)
        mine = jax.lax.dynamic_slice_in_dim(order, d * per, per)
        # duplicate padded rows are made inert by zero opacity
        slot_ok = (jax.lax.broadcasted_iota(jnp.int32, (per, 1), 0)[:, 0]
                   + d * per) < n

        sub = lambda x: x[mine]
        out = render(cam, sub(means), sub(colors),
                     jnp.where(slot_ok, sub(opacity), 0.0),
                     sub(scales), sub(rotations),
                     config=config, method=method)

        # ordered merge: exclusive prefix of log T over the mesh axis
        log_t = jnp.log1p(-jnp.minimum(out.alpha, 1.0 - 1e-7))  # (H, W)
        all_log_t = jax.lax.all_gather(log_t, axis)             # (K, H, W)
        before = jax.lax.broadcasted_iota(
            jnp.int32, (k, 1, 1), 0) < d
        prefix = jnp.sum(jnp.where(before, all_log_t, 0.0), axis=0)
        wgt = jnp.exp(prefix)
        part = jnp.concatenate([out.rgb * wgt[..., None],
                                (out.depth * wgt)[..., None],
                                (out.alpha * wgt)[..., None]], axis=-1)
        total = jax.lax.psum(part, axis)
        alpha_total = total[..., -1]
        rgb = total[..., :3]
        if bg is not None:
            rgb = rgb + (1.0 - alpha_total[..., None]) * bg
        return {"rgb": rgb, "depth": total[..., 3], "alpha": alpha_total}

    sharded = shard_map(
        local_render, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def fn(means3d, colors, opacity, scales, rotations, bg=None):
        if bg is None:
            bg = jnp.zeros((3,), jnp.float32)
        return sharded(means3d, colors, opacity.reshape(-1), scales,
                       rotations, jnp.asarray(bg, jnp.float32))

    return fn
