import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfvio_tpu import geom


def random_quat(rng, n=None):
    shape = (4,) if n is None else (n, 4)
    q = rng.standard_normal(shape)
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def test_quat_mul_matches_matrix_product():
    rng = np.random.default_rng(0)
    q1, q2 = random_quat(rng), random_quat(rng)
    R = geom.quat_to_mat(geom.quat_mul(q1, q2))
    np.testing.assert_allclose(
        R, geom.quat_to_mat(q1) @ geom.quat_to_mat(q2), atol=1e-12
    )


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = random_quat(rng, 16)
    v = jnp.asarray(rng.standard_normal((16, 3)))
    np.testing.assert_allclose(
        geom.quat_rotate(q, v),
        jnp.einsum("nij,nj->ni", geom.quat_to_mat(q), v),
        atol=1e-12,
    )


def test_mat_to_quat_roundtrip():
    rng = np.random.default_rng(2)
    q = geom.quat_positify(random_quat(rng, 64))
    q2 = geom.mat_to_quat(geom.quat_to_mat(q))
    np.testing.assert_allclose(q, q2, atol=1e-10)
    # Near-degenerate cases: 180-degree rotations about each axis.
    for axis in np.eye(3):
        R = geom.quat_to_mat(geom.so3_exp(jnp.asarray(axis * (np.pi - 1e-9))))
        qq = geom.mat_to_quat(R)
        np.testing.assert_allclose(geom.quat_to_mat(qq), R, atol=1e-8)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    theta = rng.standard_normal((32, 3))
    theta = jnp.asarray(
        theta / np.linalg.norm(theta, axis=-1, keepdims=True)
        * rng.uniform(1e-3, np.pi - 1e-3, size=(32, 1))
    )  # keep |theta| < pi so log is the exact inverse
    np.testing.assert_allclose(geom.so3_log(geom.so3_exp(theta)), theta, atol=1e-10)
    tiny = jnp.asarray(rng.standard_normal((8, 3)) * 1e-10)
    np.testing.assert_allclose(geom.so3_log(geom.so3_exp(tiny)), tiny, atol=1e-15)


def test_quat_left_right():
    rng = np.random.default_rng(4)
    q, p = random_quat(rng), random_quat(rng)
    qp = geom.quat_mul(q, p)
    np.testing.assert_allclose(geom.quat_left(q) @ p, qp, atol=1e-12)
    np.testing.assert_allclose(geom.quat_right(p) @ q, qp, atol=1e-12)


def test_ypr_roundtrip():
    ypr = jnp.asarray([33.0, -12.0, 71.0])
    R = geom.ypr_deg_to_R(ypr)
    np.testing.assert_allclose(geom.R_to_ypr_deg(R), ypr, atol=1e-9)


def test_g2R_aligns_gravity_with_zero_yaw():
    rng = np.random.default_rng(5)
    for _ in range(10):
        g = jnp.asarray(rng.standard_normal(3))
        g = g * jnp.sign(g[2] + 1e-12)  # avoid exactly antiparallel degeneracy
        R0 = geom.g2R(g)
        aligned = R0 @ (g / jnp.linalg.norm(g))
        np.testing.assert_allclose(aligned, [0, 0, 1], atol=1e-9)
        assert abs(float(geom.R_to_ypr_deg(R0)[0])) < 1e-6


def test_tangent_basis_orthonormal():
    rng = np.random.default_rng(6)
    a = rng.standard_normal((32, 3))
    a = jnp.asarray(a / np.linalg.norm(a, axis=-1, keepdims=True))
    B = geom.tangent_basis(a)
    # Rows orthonormal and orthogonal to a.
    np.testing.assert_allclose(
        jnp.einsum("nij,nkj->nik", B, B), np.tile(np.eye(2), (32, 1, 1)), atol=1e-12
    )
    np.testing.assert_allclose(jnp.einsum("nij,nj->ni", B, a), 0.0, atol=1e-12)
    # +z special case handled.
    Bz = geom.tangent_basis(jnp.asarray([0.0, 0.0, 1.0]))
    assert np.isfinite(np.asarray(Bz)).all()


def test_quat_box_minus_small_angle():
    rng = np.random.default_rng(7)
    q0 = random_quat(rng)
    delta = jnp.asarray([1e-4, -2e-4, 3e-4])
    q = geom.quat_mul(q0, geom.so3_exp(delta))
    np.testing.assert_allclose(geom.quat_box_minus(q, q0), delta, rtol=1e-6)


def test_quat_from_two_vectors():
    rng = np.random.default_rng(8)
    a = rng.standard_normal((16, 3))
    a = jnp.asarray(a / np.linalg.norm(a, axis=-1, keepdims=True))
    b = rng.standard_normal((16, 3))
    b = jnp.asarray(b / np.linalg.norm(b, axis=-1, keepdims=True))
    q = geom.quat_from_two_vectors(a, b)
    np.testing.assert_allclose(geom.quat_rotate(q, a), b, atol=1e-10)
    # Antiparallel case.
    qa = geom.quat_from_two_vectors(jnp.asarray([1.0, 0, 0]), jnp.asarray([-1.0, 0, 0]))
    np.testing.assert_allclose(
        geom.quat_rotate(qa, jnp.asarray([1.0, 0, 0])), [-1, 0, 0], atol=1e-9
    )


def test_host_geom_parity():
    """numpy host mirrors must match the jnp geometry core."""
    from lfvio_tpu.geom import host as hg

    rng = np.random.default_rng(9)
    for _ in range(20):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        p = rng.standard_normal(4)
        p /= np.linalg.norm(p)
        th = rng.standard_normal(3) * 0.7
        np.testing.assert_allclose(
            hg.quat_mul(q, p), geom.quat_mul(jnp.asarray(q), jnp.asarray(p)), atol=1e-12
        )
        np.testing.assert_allclose(
            hg.quat_to_mat(q), geom.quat_to_mat(jnp.asarray(q)), atol=1e-12
        )
        np.testing.assert_allclose(
            hg.so3_exp(th), geom.so3_exp(jnp.asarray(th)), atol=1e-12
        )
        R = np.asarray(geom.quat_to_mat(jnp.asarray(q)))
        qq = hg.mat_to_quat(R)
        np.testing.assert_allclose(hg.quat_to_mat(qq), R, atol=1e-10)
        np.testing.assert_allclose(
            hg.R_to_ypr_deg(R), geom.R_to_ypr_deg(jnp.asarray(R)), atol=1e-9
        )
        ypr = rng.uniform(-80, 80, 3)
        np.testing.assert_allclose(
            hg.ypr_deg_to_R(ypr), geom.ypr_deg_to_R(jnp.asarray(ypr)), atol=1e-12
        )
        g = rng.standard_normal(3)
        np.testing.assert_allclose(
            hg.g2R(g), geom.g2R(jnp.asarray(g)), atol=1e-9
        )
