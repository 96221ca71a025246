"""EWA projection preprocess: the per-Gaussian geometry stage (pure XLA).

TPU-native equivalent of the reference CUDA `preprocessCUDA` kernel
(…/cuda_rasterizer/forward.cu:167-269) and its backward
(…/cuda_rasterizer/backward.cu:144-429): frustum culling, 3D covariance from
scale/quaternion, EWA 2D covariance with the focal Jacobian and
principal-point-aware clamping, conic inversion, 3-sigma screen radius and
touched-tile counting. Implemented as fully vectorized elementwise math so XLA
fuses it into a handful of VPU loops, and the backward comes from autodiff
instead of the reference's ~500 lines of hand-written gradient CUDA.

Math conventions match the reference exactly:
  cov3D  = R S^2 R^T                               (forward.cu:129-163)
  cov2D  = J W cov3D W^T J^T + 0.3*I               (forward.cu:75-124)
  conic  = inverse(cov2D)                          (forward.cu:232-234)
  radius = ceil(3*sqrt(max eigenvalue))            (forward.cu:238-245)
  ndc2pix(v, S) = ((v+1)*S - 1)/2                  (auxiliary.h:41-44)
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp

from dynamic3dgaussians_tpu.ops.camera import Camera
from dynamic3dgaussians_tpu.ops.quat import quat_to_rotmat

# Low-pass filter ensuring every gaussian is >= ~1px (forward.cu:121-122).
COV2D_BLUR = 0.3
# Guard for the eigenvalue sqrt (forward.cu:242-243).
EIG_GUARD = 0.1


@flax.struct.dataclass
class Projected:
    """Per-gaussian screen-space primitives produced by `project`."""

    mean2d: jnp.ndarray    # (N, 2) pixel coords of the projected center
    conic: jnp.ndarray     # (N, 3) upper-tri of inverse 2D covariance (a,b,c)
    depth: jnp.ndarray     # (N,)  view-space z
    radius: jnp.ndarray    # (N,)  integer screen radius (0 => culled)
    valid: jnp.ndarray     # (N,)  bool, survives frustum/det/extent culling


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """3D covariance Sigma = R diag(s)^2 R^T, packed symmetric.

    Args:
      scales: (N, 3) positive scales (already exp-activated).
      rotations: (N, 4) unit wxyz quaternions (already normalized).
    Returns:
      (N, 6) packed [xx, xy, xz, yy, yz, zz]  (forward.cu:129-163 layout).
    """
    R = quat_to_rotmat(rotations, normalized=True)
    M = R * (scale_modifier * scales)[..., None, :]  # R @ diag(s)
    sigma = M @ jnp.swapaxes(M, -1, -2)
    return jnp.stack(
        [sigma[..., 0, 0], sigma[..., 0, 1], sigma[..., 0, 2],
         sigma[..., 1, 1], sigma[..., 1, 2], sigma[..., 2, 2]], axis=-1)


def _ewa_cov2d(means3d: jnp.ndarray, cov3d: jnp.ndarray, cam: Camera):
    """EWA 2D covariance (forward.cu:75-124), principal-point-aware clamping.

    Returns (N, 3) packed [xx, xy, yy] with the +0.3 low-pass on the diagonal.
    """
    t = means3d @ cam.w2c[:3, :3].T + cam.w2c[:3, 3]
    tz = t[..., 2]
    txtz = t[..., 0] / tz
    tytz = t[..., 1] / tz
    # The fork's principal-point-aware limits (forward.cu:86-99); the later
    # clamp overwrites the symmetric 1.3*tanfov one, so only it applies.
    lim_x_pos = (cam.width - cam.cx) / cam.fx + 0.3 * cam.tan_fovx
    lim_x_neg = cam.cx / cam.fx + 0.3 * cam.tan_fovx
    lim_y_pos = (cam.height - cam.cy) / cam.fy + 0.3 * cam.tan_fovy
    lim_y_neg = cam.cy / cam.fy + 0.3 * cam.tan_fovy
    tx = jnp.clip(txtz, -lim_x_neg, lim_x_pos) * tz
    ty = jnp.clip(tytz, -lim_y_neg, lim_y_pos) * tz

    # J rows: d(pix)/d(view); W = rotation block of w2c. T = J @ W, (N, 2, 3).
    fx, fy = cam.fx, cam.fy
    zeros = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([fx / tz, zeros, -fx * tx / (tz * tz)], axis=-1),
        jnp.stack([zeros, fy / tz, -fy * ty / (tz * tz)], axis=-1),
    ], axis=-2)
    T = J @ cam.w2c[:3, :3]

    V = unpack_sym3(cov3d)                       # (N, 3, 3)
    cov2d = T @ V @ jnp.swapaxes(T, -1, -2)      # (N, 2, 2)
    return jnp.stack([cov2d[..., 0, 0] + COV2D_BLUR,
                      cov2d[..., 0, 1],
                      cov2d[..., 1, 1] + COV2D_BLUR], axis=-1)


def unpack_sym3(packed: jnp.ndarray) -> jnp.ndarray:
    """(N, 6) [xx,xy,xz,yy,yz,zz] -> (N, 3, 3) symmetric matrices."""
    xx, xy, xz, yy, yz, zz = jnp.moveaxis(packed, -1, 0)
    return jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ], axis=-2)


def ndc2pix(v: jnp.ndarray, size) -> jnp.ndarray:
    """NDC in [-1,1] -> continuous pixel coordinate (auxiliary.h:41-44)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def project(means3d: jnp.ndarray,
            scales: jnp.ndarray,
            rotations: jnp.ndarray,
            cam: Camera,
            scale_modifier: float = 1.0,
            cov3d_precomp: Optional[jnp.ndarray] = None,
            mean2d_probe_ndc: Optional[jnp.ndarray] = None) -> Projected:
    """Project gaussians to screen space (the N1 preprocess stage).

    Args:
      means3d: (N, 3) world centers.
      scales: (N, 3) positive scales (exp-activated).
      rotations: (N, 4) unit quaternions.
      cam: Camera.
      cov3d_precomp: optional (N, 6) packed covariance overriding scales/rots
        (parity with the `cov3D_precomp` path, gaussian_renderer/__init__.py).
      mean2d_probe_ndc: optional (N, 2) zeros added to the NDC projection; its
        gradient reproduces the reference's `means2D` probe tensor used for
        densification stats (helpers.py:105, external.py:136-140). The CUDA
        backward scales that gradient by W/2, H/2 (backward.cu:520-521), i.e.
        accumulates in NDC units — adding the probe in NDC space matches.

    Returns:
      Projected primitives; `valid` combines the near cull (forward.cu uses
      view z <= 0; we cull at z <= near for numerical safety), zero-determinant
      cull and zero-extent cull.
    """
    p_hom = means3d @ cam.full_proj[:3, :3].T + cam.full_proj[:3, 3]
    p_w_hom = means3d @ cam.full_proj[3, :3] + cam.full_proj[3, 3]
    inv_w = 1.0 / (p_w_hom + 1e-7)
    ndc_xy = p_hom[..., :2] * inv_w[..., None]
    if mean2d_probe_ndc is not None:
        ndc_xy = ndc_xy + mean2d_probe_ndc
    mean2d = jnp.stack([ndc2pix(ndc_xy[..., 0], cam.width),
                        ndc2pix(ndc_xy[..., 1], cam.height)], axis=-1)

    depth = means3d @ cam.w2c[2, :3] + cam.w2c[2, 3]
    in_front = depth > cam.near

    cov3d = cov3d_precomp if cov3d_precomp is not None else build_cov3d(
        scales, rotations, scale_modifier)
    cov2d = _ewa_cov2d(means3d, cov3d, cam)
    cxx, cxy, cyy = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = cxx * cyy - cxy * cxy
    det_ok = det > 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det
    conic = jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=-1)

    mid = 0.5 * (cxx + cyy)
    lam = mid + jnp.sqrt(jnp.maximum(EIG_GUARD, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam, 0.0)))
    valid = in_front & det_ok
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    # Zero-extent cull: gaussians whose 3-sigma rect misses the image.
    on_screen = ((mean2d[..., 0] + radius_f >= 0)
                 & (mean2d[..., 0] - radius_f <= cam.width - 1)
                 & (mean2d[..., 1] + radius_f >= 0)
                 & (mean2d[..., 1] - radius_f <= cam.height - 1))
    valid = valid & on_screen & (radius > 0)
    radius = jnp.where(valid, radius, 0)
    return Projected(mean2d=mean2d, conic=conic, depth=depth,
                     radius=radius, valid=valid)


def tile_rect(proj: Projected, tile_h: int, tile_w: int, grid_h: int,
              grid_w: int):
    """Tile-rectangle bounds per gaussian (auxiliary.h getRect semantics).

    Returns (rect_min, rect_max) each (N, 2) in (tx, ty) tile coords with
    rect_max exclusive, clamped to the grid, and the touched-tile count.
    """
    r = proj.radius.astype(jnp.float32)
    x, y = proj.mean2d[..., 0], proj.mean2d[..., 1]
    tx0 = jnp.clip(jnp.floor((x - r) / tile_w), 0, grid_w).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - r) / tile_h), 0, grid_h).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((x + r) / tile_w) + 1, 0, grid_w).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((y + r) / tile_h) + 1, 0, grid_h).astype(jnp.int32)
    count = jnp.where(proj.valid, (tx1 - tx0) * (ty1 - ty0), 0)
    rect_min = jnp.stack([tx0, ty0], axis=-1)
    rect_max = jnp.stack([tx1, ty1], axis=-1)
    return rect_min, rect_max, count
