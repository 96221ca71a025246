"""Camera model: OpenCV intrinsics -> projective transform pytree.

TPU-native replacement for the reference's `setup_camera`
(reference helpers.py:68-95) and `GaussianRasterizationSettings`
(…/diff_gaussian_rasterization/__init__.py:176-192). Image height/width are
static pytree metadata (XLA needs static shapes); everything else is arrays so
cameras can be vmapped/sharded. The dead `confidence` field of the reference
settings (never consumed by its CUDA entry points, SURVEY.md §2.4) is dropped.

Convention (math, column vectors): p_view = w2c @ [p;1], p_clip = proj @ p_view,
identical to the reference's row-vector/transposed-storage pipeline
(helpers.py:72-77 combined with forward.cu transformPoint4x4).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Camera:
    """A pinhole camera with OpenGL-style projection for gaussian splatting.

    Array fields may carry a leading batch dim when vmapped.
    """

    w2c: jnp.ndarray          # (4, 4) world -> camera
    proj: jnp.ndarray         # (4, 4) camera -> clip (OpenGL-style)
    full_proj: jnp.ndarray    # (4, 4) proj @ w2c
    cam_center: jnp.ndarray   # (3,)  camera center in world coords
    fx: jnp.ndarray           # () focal in pixels
    fy: jnp.ndarray
    cx: jnp.ndarray           # () principal point in pixels
    cy: jnp.ndarray
    # static metadata
    height: int = flax.struct.field(pytree_node=False, default=0)
    width: int = flax.struct.field(pytree_node=False, default=0)
    near: float = flax.struct.field(pytree_node=False, default=0.01)
    far: float = flax.struct.field(pytree_node=False, default=100.0)

    @property
    def tan_fovx(self) -> jnp.ndarray:
        return self.width / (2.0 * self.fx)

    @property
    def tan_fovy(self) -> jnp.ndarray:
        return self.height / (2.0 * self.fy)


def opengl_projection(fx, fy, cx, cy, w: int, h: int, near: float, far: float,
                      dtype=jnp.float32) -> jnp.ndarray:
    """OpenGL-style projection from OpenCV intrinsics (helpers.py:73-76).

    z_clip = far/(far-near) * z_view - far*near/(far-near); w_clip = z_view.
    """
    z = jnp.zeros((), dtype)
    row0 = jnp.stack([2 * fx / w + z, z, -(w - 2 * cx) / w + z, z])
    row1 = jnp.stack([z, 2 * fy / h + z, -(h - 2 * cy) / h + z, z])
    row2 = jnp.stack([z, z, z + far / (far - near), z - (far * near) / (far - near)])
    row3 = jnp.stack([z, z, z + 1.0, z])
    return jnp.stack([row0, row1, row2, row3]).astype(dtype)


def make_camera(w: int, h: int, k, w2c, near: float = 0.01,
                far: float = 100.0) -> Camera:
    """Build a Camera from a 3x3 intrinsics matrix and a 4x4 w2c extrinsic.

    Mirrors reference helpers.py:68-95 `setup_camera(w, h, k, w2c, near, far)`.
    """
    k = jnp.asarray(k, jnp.float32)
    w2c = jnp.asarray(w2c, jnp.float32)
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    proj = opengl_projection(fx, fy, cx, cy, w, h, near, far)
    # HIGHEST: at DEFAULT precision the TPU MXU computes these 4x4 products
    # in bf16, perturbing full_proj by ~2^-8 relative — which shifts every
    # projected splat center a fraction of a pixel and moved whole renders
    # ~4e-2 off the frozen CPU fixtures (round-4 gate FAIL, feature_field).
    # Camera setup is a handful of FLOPs once per frame; exactness is free.
    with jax.default_matmul_precision("highest"):
        c2w = jnp.linalg.inv(w2c)
        full_proj = proj @ w2c
    return Camera(
        w2c=w2c,
        proj=proj,
        full_proj=full_proj,
        cam_center=c2w[:3, 3],
        fx=fx, fy=fy, cx=cx, cy=cy,
        height=int(h), width=int(w), near=float(near), far=float(far),
    )


def orbit_cameras(center, radius: float, height: float, n: int, w: int, h: int,
                  f: float, near: float = 0.01, far: float = 100.0):
    """n cameras on a circle looking at `center` (test/viz helper, numpy)."""
    cams = []
    center = np.asarray(center, np.float64)
    for i in range(n):
        a = 2 * np.pi * i / max(n, 1)
        eye = center + np.array([radius * np.cos(a), height, radius * np.sin(a)])
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])  # reference scenes are y-down
        right = np.cross(up, fwd)
        right = right / np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, fwd, eye
        w2c = np.linalg.inv(c2w)
        k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float64)
        cams.append(make_camera(w, h, k, w2c, near, far))
    return cams


def stack_cameras(cams):
    """Stack a list of Cameras into one batched Camera pytree (leaf-wise
    jnp.stack) for vmapped multi-frame rendering; static fields (width/
    height/near/far) must agree and are taken from the first camera."""
    import jax
    first = cams[0]
    assert all((c.width, c.height) == (first.width, first.height)
               for c in cams), "stack_cameras: mixed image sizes"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
