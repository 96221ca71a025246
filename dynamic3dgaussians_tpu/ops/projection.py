"""EWA projection preprocess: the per-Gaussian geometry stage (pure XLA).

TPU-native equivalent of the reference CUDA `preprocessCUDA` kernel
(…/cuda_rasterizer/forward.cu:167-269) and its backward
(…/cuda_rasterizer/backward.cu:144-429): frustum culling, 3D covariance from
scale/quaternion, EWA 2D covariance with the focal Jacobian and
principal-point-aware clamping, conic inversion, 3-sigma screen radius and
touched-tile counting. Implemented as fully vectorized elementwise math so XLA
fuses it into a handful of VPU loops, and the backward comes from autodiff
instead of the reference's ~500 lines of hand-written gradient CUDA.

TPU layout note: every per-gaussian quantity here is a FLAT (N,) array
(structure-of-arrays). TPU arrays tile as (8 sublanes, 128 lanes); an (N, 3)
array pads its minor dim 3 -> 128, wasting ~40x HBM bandwidth on every pass.
`Projected` therefore stores flat components and offers stacked `.mean2d` /
`.conic` views only for convenience/tests.

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

# Low-pass filter ensuring every gaussian is >= ~1px (forward.cu:121-122).
COV2D_BLUR = 0.3
# Guard for the eigenvalue sqrt (forward.cu:242-243).
EIG_GUARD = 0.1


@flax.struct.dataclass
class Projected:
    """Per-gaussian screen-space primitives produced by `project`.

    All fields are flat (N,) arrays (see module docstring for why).
    """

    x2d: jnp.ndarray       # (N,) pixel x of the projected center
    y2d: jnp.ndarray       # (N,) pixel y
    conic_a: jnp.ndarray   # (N,) inverse 2D covariance upper-tri a
    conic_b: jnp.ndarray   # (N,) b
    conic_c: jnp.ndarray   # (N,) c
    depth: jnp.ndarray     # (N,) view-space z
    radius: jnp.ndarray    # (N,) integer screen radius (0 => culled)
    valid: jnp.ndarray     # (N,) bool, survives frustum/det/extent culling

    @property
    def mean2d(self) -> jnp.ndarray:
        """(N, 2) stacked view (convenience; prefer the flat fields)."""
        return jnp.stack([self.x2d, self.y2d], axis=-1)

    @property
    def conic(self) -> jnp.ndarray:
        """(N, 3) stacked view (convenience; prefer the flat fields)."""
        return jnp.stack([self.conic_a, self.conic_b, self.conic_c], axis=-1)


def _components3(v: jnp.ndarray):
    """(N, 3) -> three flat (N,) components (one relayout pass each)."""
    return v[..., 0], v[..., 1], v[..., 2]


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """3D covariance Sigma = R diag(s)^2 R^T, packed symmetric.

    Fully expanded elementwise (no (N,3,3) batched matmuls — those pad each
    tiny contraction onto the MXU and are ~100x slower than VPU arithmetic).

    Args:
      scales: (N, 3) positive scales (already exp-activated).
      rotations: (N, 4) unit wxyz quaternions (already normalized).
    Returns:
      (N, 6) packed [xx, xy, xz, yy, yz, zz]  (forward.cu:129-163 layout).
    """
    return jnp.stack(_cov3d_components(scales, rotations, scale_modifier),
                     axis=-1)


def _cov3d_components(scales, rotations, scale_modifier=1.0):
    r, x, y, z = (rotations[..., 0], rotations[..., 1], rotations[..., 2],
                  rotations[..., 3])
    # rotation-matrix components (standard form, external.py:61-78)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    sx, sy, sz = _components3(scales)
    s0 = (scale_modifier * sx) ** 2
    s1 = (scale_modifier * sy) ** 2
    s2_ = (scale_modifier * sz) ** 2
    # Sigma_ab = sum_k s_k^2 R_ak R_bk
    return (
        s0 * r00 * r00 + s1 * r01 * r01 + s2_ * r02 * r02,
        s0 * r00 * r10 + s1 * r01 * r11 + s2_ * r02 * r12,
        s0 * r00 * r20 + s1 * r01 * r21 + s2_ * r02 * r22,
        s0 * r10 * r10 + s1 * r11 * r11 + s2_ * r12 * r12,
        s0 * r10 * r20 + s1 * r11 * r21 + s2_ * r12 * r22,
        s0 * r20 * r20 + s1 * r21 * r21 + s2_ * r22 * r22,
    )


def _ewa_cov2d(mx, my, mz, cov6, cam: Camera):
    """EWA 2D covariance (forward.cu:75-124), principal-point-aware clamping.

    Returns flat (cxx, cxy, cyy) with the +0.3 low-pass on the diagonal.
    """
    V = cam.w2c
    tx0 = V[0, 0] * mx + V[0, 1] * my + V[0, 2] * mz + V[0, 3]
    ty0 = V[1, 0] * mx + V[1, 1] * my + V[1, 2] * mz + V[1, 3]
    tz = V[2, 0] * mx + V[2, 1] * my + V[2, 2] * mz + V[2, 3]
    txtz = tx0 / tz
    tytz = ty0 / tz
    # The fork's principal-point-aware limits (forward.cu:86-99); the later
    # clamp overwrites the symmetric 1.3*tanfov one, so only it applies.
    lim_x_pos = (cam.width - cam.cx) / cam.fx + 0.3 * cam.tan_fovx
    lim_x_neg = cam.cx / cam.fx + 0.3 * cam.tan_fovx
    lim_y_pos = (cam.height - cam.cy) / cam.fy + 0.3 * cam.tan_fovy
    lim_y_neg = cam.cy / cam.fy + 0.3 * cam.tan_fovy
    tx = jnp.clip(txtz, -lim_x_neg, lim_x_pos) * tz
    ty = jnp.clip(tytz, -lim_y_neg, lim_y_pos) * tz

    # T = J @ W with J = [[fx/tz, 0, -fx tx/tz^2], [0, fy/tz, -fy ty/tz^2]]
    # and W the rotation block of w2c — expanded elementwise (each T row is
    # a linear combination of two constant W rows; no batched matmuls).
    fx, fy = cam.fx, cam.fy
    W = cam.w2c[:3, :3]
    a0 = fx / tz
    a2 = -fx * tx / (tz * tz)
    b1 = fy / tz
    b2 = -fy * ty / (tz * tz)
    # rows of T as flat components
    t0x = a0 * W[0, 0] + a2 * W[2, 0]
    t0y = a0 * W[0, 1] + a2 * W[2, 1]
    t0z = a0 * W[0, 2] + a2 * W[2, 2]
    t1x = b1 * W[1, 0] + b2 * W[2, 0]
    t1y = b1 * W[1, 1] + b2 * W[2, 1]
    t1z = b1 * W[1, 2] + b2 * W[2, 2]

    vxx, vxy, vxz, vyy, vyz, vzz = cov6

    def quad(ux, uy, uz, vx, vy, vz):
        return (ux * vx * vxx + uy * vy * vyy + uz * vz * vzz
                + (ux * vy + uy * vx) * vxy
                + (ux * vz + uz * vx) * vxz
                + (uy * vz + uz * vy) * vyz)

    cxx = quad(t0x, t0y, t0z, t0x, t0y, t0z) + COV2D_BLUR
    cxy = quad(t0x, t0y, t0z, t1x, t1y, t1z)
    cyy = quad(t1x, t1y, t1z, t1x, t1y, t1z) + COV2D_BLUR
    return cxx, cxy, cyy


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
    M = cam.full_proj
    mx, my, mz = _components3(means3d)
    px_hom = M[0, 0] * mx + M[0, 1] * my + M[0, 2] * mz + M[0, 3]
    py_hom = M[1, 0] * mx + M[1, 1] * my + M[1, 2] * mz + M[1, 3]
    p_w_hom = M[3, 0] * mx + M[3, 1] * my + M[3, 2] * mz + M[3, 3]
    inv_w = 1.0 / (p_w_hom + 1e-7)
    ndc_x = px_hom * inv_w
    ndc_y = py_hom * inv_w
    if mean2d_probe_ndc is not None:
        ndc_x = ndc_x + mean2d_probe_ndc[..., 0]
        ndc_y = ndc_y + mean2d_probe_ndc[..., 1]
    x2d = ndc2pix(ndc_x, cam.width)
    y2d = ndc2pix(ndc_y, cam.height)

    V = cam.w2c
    depth = V[2, 0] * mx + V[2, 1] * my + V[2, 2] * mz + V[2, 3]
    in_front = depth > cam.near

    if cov3d_precomp is not None:
        cov6 = tuple(cov3d_precomp[..., i] for i in range(6))
    else:
        cov6 = _cov3d_components(scales, rotations, scale_modifier)
    cxx, cxy, cyy = _ewa_cov2d(mx, my, mz, cov6, cam)
    det = cxx * cyy - cxy * cxy
    det_ok = det > 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det
    conic_a = cyy * inv_det
    conic_b = -cxy * inv_det
    conic_c = cxx * inv_det

    mid = 0.5 * (cxx + cyy)
    lam = mid + jnp.sqrt(jnp.maximum(EIG_GUARD, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam, 0.0)))
    valid = in_front & det_ok
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    # Zero-extent cull: gaussians whose 3-sigma rect misses the image.
    on_screen = ((x2d + radius_f >= 0)
                 & (x2d - radius_f <= cam.width - 1)
                 & (y2d + radius_f >= 0)
                 & (y2d - radius_f <= cam.height - 1))
    valid = valid & on_screen & (radius > 0)
    radius = jnp.where(valid, radius, 0)
    return Projected(x2d=x2d, y2d=y2d, conic_a=conic_a, conic_b=conic_b,
                     conic_c=conic_c, depth=depth, radius=radius, valid=valid)


def tile_rect(proj: Projected, tile_h: int, tile_w: int, grid_h: int,
              grid_w: int):
    """Tile-rectangle bounds per gaussian (auxiliary.h getRect semantics).

    Returns flat (tx0, ty0, tx1, ty1, count): tile coords with the max side
    exclusive, clamped to the grid, plus the touched-tile count.
    """
    r = proj.radius.astype(jnp.float32)
    x, y = proj.x2d, proj.y2d
    tx0 = jnp.clip(jnp.floor((x - r) / tile_w), 0, grid_w).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - r) / tile_h), 0, grid_h).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((x + r) / tile_w) + 1, 0, grid_w).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((y + r) / tile_h) + 1, 0, grid_h).astype(jnp.int32)
    count = jnp.where(proj.valid, (tx1 - tx0) * (ty1 - ty0), 0)
    return tx0, ty0, tx1, ty1, count
