"""Numerical tests for the QuadX dynamics + control cascade."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyflyt_tpu.core import integrator
from pyflyt_tpu.models import quadx
from pyflyt_tpu.ops import pid

CFG = quadx.QuadXConfig(noisy_motors=False)
PARAMS = quadx.build_params(CFG)

MASS = 0.027
G = 9.81
# per-motor hover thrust fraction: total_thrust=2.0 => throttle = sqrt(mg/2)
HOVER_PWM = float(np.sqrt(MASS * G / 2.0))


def make_state(pos=(0.0, 0.0, 1.0), orn=(0.0, 0.0, 0.0)):
    return quadx.init_state(PARAMS, CFG, jnp.asarray(pos), jnp.asarray(orn))


def test_motor_first_order_lag():
    # throttle(t) = 1 - exp(-t/tau) for a unit pwm step (discrete Euler form)
    state = make_state()
    throttle = state.throttle
    dt = CFG.physics_period
    tau = 0.01
    from pyflyt_tpu.ops import motors as motor_ops

    expected = 0.0
    for _ in range(10):
        throttle = motor_ops.throttle_update(
            throttle, jnp.ones(4), PARAMS.motor, dt, None
        )
        expected += (dt / tau) * (1.0 - expected)
    np.testing.assert_allclose(throttle, expected, rtol=1e-5)


def test_pid_step_closed_form():
    p = pid.PIDParams(
        kp=jnp.array([0.5]), ki=jnp.array([0.4]), kd=jnp.array([0.3]),
        lim=jnp.array([10.0]), period=0.01,
    )
    st = pid.init(p)
    st, out = pid.step(st, p, jnp.array([2.0]), jnp.array([5.0]))
    # e=3: out = 0.5*3 + clip(0.4*3*0.01) + 0.3*(3-0)/0.01 = 1.5 + 0.012 + 90
    np.testing.assert_allclose(out, [10.0])  # clipped at limit
    np.testing.assert_allclose(st.integral, [0.012])
    st, out = pid.step(st, p, jnp.array([4.0]), jnp.array([5.0]))
    # e=1: p=0.5, i=0.012+0.004=0.016, d=0.3*(1-3)/0.01=-60 -> clip(-59.484)->-10
    np.testing.assert_allclose(out, [-10.0])


def test_hover_equilibrium_mode_neg1():
    """At the analytic hover PWM the quad should stay nearly still (no noise)."""
    state = make_state()
    # pre-spin the motors to the hover point to skip the open-loop spin-up
    # transient (which leaves a permanent residual velocity g*tau)
    state = state.replace(
        setpoint=jnp.full((4,), HOVER_PWM), throttle=jnp.full((4,), HOVER_PWM)
    )

    def body(state, _):
        state, _ = quadx.step(state, PARAMS, CFG, mode=-1)
        return state, None

    state, _ = jax.lax.scan(body, state, None, length=240)  # 2 seconds
    assert abs(float(state.body.pos[2]) - 1.0) < 0.02
    np.testing.assert_allclose(state.body.pos[:2], 0.0, atol=1e-5)
    assert float(jnp.linalg.norm(state.body.lin_vel)) < 0.01
    assert not bool(state.contact)


def test_mode7_position_hold():
    """Position mode should hold the spawn point within centimeters."""
    state = make_state()
    state = quadx.set_mode(state, 7, CFG)
    state = state.replace(setpoint=jnp.array([0.0, 0.0, 0.0, 1.0]))

    def body(state, _):
        return quadx.step(state, PARAMS, CFG, mode=7)[0], None

    state, _ = jax.lax.scan(body, state, None, length=480)  # 4 seconds
    # the reference cascade has no gravity feedforward: the vehicle sags below
    # the setpoint until the z-velocity integral winds up, with a small limit
    # cycle from the derivative term + one-physics-step sensor latency
    err = np.abs(np.asarray(state.body.pos) - np.array([0.0, 0.0, 1.0]))
    assert err.max() < 0.1, err
    assert float(jnp.linalg.norm(state.body.lin_vel)) < 0.3


def test_mode7_position_step_response():
    """Commanding a 1m xy offset in mode 7 should converge there."""
    state = make_state()
    state = quadx.set_mode(state, 7, CFG)
    state = state.replace(setpoint=jnp.array([1.0, -1.0, 0.0, 1.5]))

    def body(state, _):
        return quadx.step(state, PARAMS, CFG, mode=7)[0], None

    state, _ = jax.lax.scan(body, state, None, length=120 * 8)
    err = np.abs(np.asarray(state.body.pos) - np.array([1.0, -1.0, 1.5]))
    # the reference cascade (identical gains + min-pwm saturation floor)
    # converges slowly on the lateral axes with a small residual oscillation
    assert err.max() < 0.3, err


def test_free_fall_and_ground_contact():
    state = make_state(pos=(0.0, 0.0, 1.0))
    # zero pwm: throttle stays 0, free fall. t = sqrt(2h/g) ~ 0.45s ~ 54 steps
    def body(state, _):
        return quadx.step(state, PARAMS, CFG, mode=-1)[0], None

    state, _ = jax.lax.scan(body, state, None, length=120)
    assert bool(state.contact)
    # resting on the ground: z ~ collision half-extent, small velocity
    assert 0.0 <= float(state.body.pos[2]) < 0.03
    assert abs(float(state.body.lin_vel[2])) < 0.3


def test_saturation_rescale_matches_reference_algorithm():
    rng = np.random.RandomState(0)
    for _ in range(50):
        pwm = rng.uniform(-0.5, 1.5, size=4)
        # reference algorithm (quadx.py:553-561) recomputed in numpy
        high, low = pwm.max(), pwm.min()
        expected = pwm.copy()
        if high != low:
            pwm_max, pwm_min = min(high, 1.0), max(low, 0.05)
            add = (pwm_min - low) / (pwm_max - low) * (pwm_max - expected)
            sub = (high - pwm_max) / (high - pwm_min) * (expected - pwm_min)
            expected = expected + add - sub
        expected = np.clip(expected, 0.05, 1.0)
        got = quadx.saturation_rescale(jnp.asarray(pwm), 0.05, 1.0)
        np.testing.assert_allclose(got, expected, atol=1e-6)


def test_batched_step_matches_single():
    """Batched stepping must equal per-instance stepping (SoA correctness)."""
    pos = jnp.asarray([[0.0, 0.0, 1.0], [0.5, -0.5, 2.0]])
    orn = jnp.zeros((2, 3))
    state_b = quadx.init_state(PARAMS, CFG, pos, orn)
    state_b = state_b.replace(
        setpoint=jnp.tile(jnp.asarray([0.1, -0.1, 0.2, 0.5]), (2, 1))
    )
    for _ in range(20):
        state_b, _ = quadx.step(state_b, PARAMS, CFG, mode=0)

    for i in range(2):
        s = quadx.init_state(PARAMS, CFG, pos[i], orn[i])
        s = s.replace(setpoint=jnp.asarray([0.1, -0.1, 0.2, 0.5]))
        for _ in range(20):
            s, _ = quadx.step(s, PARAMS, CFG, mode=0)
        np.testing.assert_allclose(state_b.body.pos[i], s.body.pos, atol=1e-5)
        np.testing.assert_allclose(state_b.body.quat[i], s.body.quat, atol=1e-5)


def test_angular_rate_tracking_mode0():
    """Mode 0 with a yaw-rate setpoint should reach that body yaw rate."""
    state = make_state()
    state = quadx.set_mode(state, 0, CFG)
    state = state.replace(setpoint=jnp.array([0.0, 0.0, 1.0, HOVER_PWM]))

    def body(state, _):
        return quadx.step(state, PARAMS, CFG, mode=0)[0], None

    state, _ = jax.lax.scan(body, state, None, length=240)
    yaw_rate = float(state.read.ang_vel_body[2])
    assert abs(yaw_rate - 1.0) < 0.1, yaw_rate


def test_gyroscopic_term_conserves_energy_in_free_rotation():
    """Torque-free tumbling should conserve rotational KE (no contact/forces)."""
    rb = integrator.RigidBodyParams(
        mass=jnp.asarray(1.0), inertia=jnp.asarray([0.1, 0.2, 0.3])
    )
    from pyflyt_tpu.core.state import Body6DoF
    from pyflyt_tpu.core import math as pm

    body = Body6DoF(
        pos=jnp.zeros(3),
        quat=pm.quat_identity(),
        lin_vel=jnp.zeros(3),
        ang_vel=jnp.asarray([1.0, 2.0, 0.5]),
    )

    def ke(b):
        R = pm.quat_to_rotmat(b.quat)
        wb = R.T @ b.ang_vel
        return float(0.5 * jnp.sum(rb.inertia * wb * wb))

    # counteract gravity so the test isolates rotation
    e0 = ke(body)
    for _ in range(480):
        body = integrator.step(
            body, rb, jnp.zeros(3), jnp.zeros(3), 1.0 / 240.0,
            force_world=jnp.asarray([0.0, 0.0, 9.81]),
        )
    e1 = ke(body)
    assert abs(e1 - e0) / e0 < 0.02, (e0, e1)
