"""Unit tests for quaternion/SH/projection geometry (SURVEY.md §7 step 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic3dgaussians_tpu.ops import quat, sh
from dynamic3dgaussians_tpu.ops.camera import make_camera
from dynamic3dgaussians_tpu.ops.projection import (
    build_cov3d, ndc2pix, project, unpack_sym3)
from tests.golden_numpy import quat_to_rotmat_np
from tests.scenes import lookat_camera, random_scene


def test_quat_to_rotmat_matches_numpy():
    rng = np.random.RandomState(0)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    got = np.asarray(quat.quat_to_rotmat(jnp.asarray(q)))
    want = quat_to_rotmat_np(q)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # orthonormality
    eye = np.einsum("nij,nkj->nik", got, got)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)


def test_quat_mult_composes_rotations():
    rng = np.random.RandomState(1)
    q1 = quat.normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
    q2 = quat.normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
    R12 = quat.quat_to_rotmat(quat.quat_mult(q1, q2))
    want = quat.quat_to_rotmat(q1) @ quat.quat_to_rotmat(q2)
    np.testing.assert_allclose(np.asarray(R12), np.asarray(want), atol=1e-5)


def test_quat_conjugate_inverts():
    rng = np.random.RandomState(2)
    q = quat.normalize(jnp.asarray(rng.normal(size=(8, 4)), jnp.float32))
    ident = quat.quat_mult(q, quat.conjugate(q))
    want = np.tile(np.array([1, 0, 0, 0], np.float32), (8, 1))
    np.testing.assert_allclose(np.asarray(ident), want, atol=1e-5)


def test_cont_6d_roundtrip():
    rng = np.random.RandomState(3)
    q = quat.normalize(jnp.asarray(rng.normal(size=(16, 4)), jnp.float32))
    R = quat.quat_to_rotmat(q)
    d6 = quat.rotmat_to_cont_6d(R)
    R2 = quat.cont_6d_to_rotmat(d6)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_cov3d_is_RSSR():
    rng = np.random.RandomState(4)
    s = np.exp(rng.normal(size=(16, 3))).astype(np.float32) * 0.1
    q = rng.normal(size=(16, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    cov = unpack_sym3(build_cov3d(jnp.asarray(s), jnp.asarray(q)))
    R = quat_to_rotmat_np(q)
    want = np.einsum("nij,nj,nkj->nik", R, s.astype(np.float64) ** 2, R)
    np.testing.assert_allclose(np.asarray(cov), want, atol=1e-5)
    # PSD check
    eig = np.linalg.eigvalsh(np.asarray(cov))
    assert (eig > -1e-6).all()


def test_sh_deg0_is_constant_color():
    rgb = jnp.asarray([[0.25, 0.5, 0.75]], jnp.float32)
    coeff = sh.rgb_to_sh(rgb)[:, None, :]  # (1,1,3)
    means = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
    got = sh.sh_to_color(0, coeff, means, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(rgb), atol=1e-6)


def test_sh_higher_degrees_vary_with_direction():
    rng = np.random.RandomState(5)
    coeff = jnp.asarray(rng.normal(size=(1, 16, 3)) * 0.3, jnp.float32)
    means = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
    c1 = sh.sh_to_color(3, coeff, means, jnp.zeros(3))
    c2 = sh.sh_to_color(3, coeff, means, jnp.asarray([3.0, 1.0, 0.0]))
    assert not np.allclose(np.asarray(c1), np.asarray(c2))


def test_ndc2pix():
    # ndc2Pix(v, S) = ((v+1)*S - 1)/2  (auxiliary.h:41-44)
    np.testing.assert_allclose(float(ndc2pix(jnp.float32(0.0), 100)), 49.5)
    np.testing.assert_allclose(float(ndc2pix(jnp.float32(-1.0), 100)), -0.5)


def test_project_center_point():
    cam, _, _ = lookat_camera(w=64, h=48, f=60.0, dist=4.0)
    means = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    scales = jnp.full((1, 3), 0.05, jnp.float32)
    quats = jnp.asarray([[1.0, 0, 0, 0]], jnp.float32)
    p = project(means, scales, quats, cam)
    assert bool(p.valid[0])
    np.testing.assert_allclose(np.asarray(p.mean2d[0]), [31.5, 23.5], atol=1e-3)
    np.testing.assert_allclose(float(p.depth[0]), 4.0, atol=1e-5)
    assert int(p.radius[0]) >= 1


def test_project_culls_behind_camera():
    cam, _, _ = lookat_camera()
    means = jnp.asarray([[0.0, 0.0, -10.0]], jnp.float32)  # behind
    scales = jnp.full((1, 3), 0.05, jnp.float32)
    quats = jnp.asarray([[1.0, 0, 0, 0]], jnp.float32)
    p = project(means, scales, quats, cam)
    assert not bool(p.valid[0])
    assert int(p.radius[0]) == 0


def test_project_grads_finite():
    cam, _, _ = lookat_camera()
    means, colors, opac, scales, quats = random_scene(50, seed=7)

    def f(m, s, q):
        p = project(m, s, q, cam)
        return jnp.sum(jnp.where(p.valid[:, None], p.mean2d, 0.0)) + \
            jnp.sum(jnp.where(p.valid[:, None], p.conic, 0.0))

    grads = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
