"""Unit tests for the quaternion/euler math core against closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyflyt_tpu.core import math as pm


@pytest.fixture(autouse=True)
def _x64():
    """Run the math precision tests in float64, restoring f32 afterwards."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def random_quats(key, n):
    q = jax.random.normal(key, (n, 4), dtype=jnp.float64)
    return pm.normalize(q)


def test_quat_identity_rotation():
    q = pm.quat_identity(dtype=jnp.float64)
    v = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(pm.quat_rotate(q, v), v, atol=1e-12)


def test_quat_rotate_matches_rotmat():
    key = jax.random.PRNGKey(0)
    q = random_quats(key, 64)
    v = jax.random.normal(jax.random.PRNGKey(1), (64, 3), dtype=jnp.float64)
    via_quat = pm.quat_rotate(q, v)
    via_mat = jnp.einsum("nij,nj->ni", pm.quat_to_rotmat(q), v)
    np.testing.assert_allclose(via_quat, via_mat, atol=1e-12)


def test_quat_rotate_inverse_roundtrip():
    key = jax.random.PRNGKey(2)
    q = random_quats(key, 32)
    v = jax.random.normal(jax.random.PRNGKey(3), (32, 3), dtype=jnp.float64)
    np.testing.assert_allclose(
        pm.quat_rotate_inv(q, pm.quat_rotate(q, v)), v, atol=1e-12
    )


def test_quat_mul_composition():
    key1, key2 = jax.random.split(jax.random.PRNGKey(4))
    q1, q2 = random_quats(key1, 16), random_quats(key2, 16)
    v = jax.random.normal(jax.random.PRNGKey(5), (16, 3), dtype=jnp.float64)
    composed = pm.quat_rotate(pm.quat_mul(q1, q2), v)
    seq = pm.quat_rotate(q1, pm.quat_rotate(q2, v))
    np.testing.assert_allclose(composed, seq, atol=1e-12)


@pytest.mark.parametrize(
    "rpy",
    [
        [0.0, 0.0, 0.0],
        [0.3, 0.0, 0.0],
        [0.0, -0.4, 0.0],
        [0.0, 0.0, 1.2],
        [0.3, -0.4, 1.2],
        [-1.0, 0.5, -2.5],
    ],
)
def test_euler_quat_roundtrip(rpy):
    rpy = jnp.asarray(rpy, dtype=jnp.float64)
    q = pm.euler_to_quat(rpy)
    np.testing.assert_allclose(pm.quat_to_euler(q), rpy, atol=1e-12)


def test_euler_to_rotmat_axis_order():
    # R = Rz(yaw) @ Ry(pitch) @ Rx(roll): pure-yaw rotates x-axis toward y.
    yaw = jnp.pi / 2
    R = pm.euler_to_rotmat(jnp.array([0.0, 0.0, yaw]))
    np.testing.assert_allclose(R @ jnp.array([1.0, 0.0, 0.0]), [0.0, 1.0, 0.0], atol=1e-12)
    # pure roll rotates y toward z
    R = pm.euler_to_rotmat(jnp.array([jnp.pi / 2, 0.0, 0.0]))
    np.testing.assert_allclose(R @ jnp.array([0.0, 1.0, 0.0]), [0.0, 0.0, 1.0], atol=1e-12)
    # combined: R @ ex == Rz Ry Rx ex
    rpy = jnp.array([0.3, -0.2, 0.9])

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    expected = rz(0.9) @ ry(-0.2) @ rx(0.3)
    np.testing.assert_allclose(pm.euler_to_rotmat(rpy), expected, atol=1e-12)


def test_quat_integrate_constant_rate():
    # integrating a constant world-frame yaw rate should produce exact yaw
    q0 = pm.quat_identity(dtype=jnp.float64)
    omega = jnp.array([0.0, 0.0, 2.0])  # rad/s about world z
    dt = 0.01
    q = q0
    for _ in range(100):
        q = pm.quat_integrate(q, omega, dt)
    rpy = pm.quat_to_euler(q)
    np.testing.assert_allclose(rpy, [0.0, 0.0, 2.0], atol=1e-9)


def test_quat_integrate_zero_rate_stable():
    q0 = pm.normalize(jnp.array([0.1, 0.2, 0.3, 0.9]))
    q1 = pm.quat_integrate(q0, jnp.zeros(3), 1.0 / 240.0)
    np.testing.assert_allclose(q1, q0, atol=1e-12)
    assert not jnp.any(jnp.isnan(q1))


def test_quat_integrate_differentiable_at_zero():
    def f(w):
        return jnp.sum(pm.quat_integrate(pm.quat_identity(dtype=jnp.float64), w, 0.01))

    g = jax.grad(f)(jnp.zeros(3))
    assert not jnp.any(jnp.isnan(g))


def test_wrap_angle():
    np.testing.assert_allclose(pm.wrap_angle(jnp.array(3 * jnp.pi)), -jnp.pi, atol=1e-12)
    np.testing.assert_allclose(pm.wrap_angle(jnp.array(0.5)), 0.5, atol=1e-12)


def test_ned_remaps_are_involutions():
    v = jnp.array([1.0, -2.0, 3.0])
    np.testing.assert_allclose(pm.ned_pos_to_enu(pm.enu_pos_to_ned(v)), v, atol=1e-12)
    rpy = jnp.array([0.2, -0.3, 0.7])
    np.testing.assert_allclose(
        pm.ned_euler_to_enu(pm.enu_euler_to_ned(rpy)), rpy, atol=1e-12
    )
    np.testing.assert_allclose(pm.flu_vec_to_frd(pm.flu_vec_to_frd(v)), v, atol=1e-12)
