"""Differentiable-simulation + parameter-batching tests.

These cover capability the PyBullet reference structurally cannot offer (its
physics lives behind a C++ boundary): reverse-mode gradients through the full
control cascade + integrator (BPTT), gradient-based system identification,
and per-env vehicle-parameter batching (domain randomization) via vmap over
the params pytree. The physics being differentiated is the parity-tested
core (models/quadx.py, core/integrator.py); what is asserted here is that
the program stays NaN-free under ``jax.grad`` — see ``core.math.safe_norm``
for the zero-vector norm cotangent hazard these tests pin down.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pyflyt_tpu.core import math as pm
from pyflyt_tpu.models import fixedwing, quadx

CFG = quadx.QuadXConfig(noisy_motors=False)
PARAMS = quadx.build_params(CFG)
TARGET = jnp.array([0.4, -0.4, 1.6])  # ENU position target from spawn (0,0,1)
BANKS = ("ang_vel", "ang_pos", "lin_vel", "lin_pos", "z_pos", "z_vel")

MASS = 0.027
HOVER_PWM = float(np.sqrt(MASS * 9.81 / 2.0))  # per-motor at total_thrust=2


# --------------------------------------------------------------- safe_norm
def test_safe_norm_value_and_grad():
    v = jnp.array([[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]])
    np.testing.assert_allclose(
        pm.safe_norm(v), jnp.linalg.norm(v, axis=-1), rtol=1e-7
    )
    g = jax.grad(lambda x: jnp.sum(pm.safe_norm(x)))(v)
    np.testing.assert_allclose(g[0], [0.6, 0.8, 0.0], rtol=1e-6)
    # at the origin the (sub)gradient is 0, NOT NaN
    np.testing.assert_allclose(g[1], [0.0, 0.0, 0.0])


# ------------------------------------------------- BPTT through the cascade
def _with_gain_scales(params, theta):
    """Scales every PID bank's gains by exp(theta) (scale-invariant tuning)."""
    reps = {}
    for name in BANKS:
        bank = getattr(params, f"pid_{name}")
        s = theta[name]
        reps[f"pid_{name}"] = bank.replace(
            kp=bank.kp * jnp.exp(s["kp"]),
            ki=bank.ki * jnp.exp(s["ki"]),
            kd=bank.kd * jnp.exp(s["kd"]),
        )
    return params.replace(**reps)


def _step_response_loss(theta, T=120):
    """Mean squared position error over a mode-7 step response (BPTT)."""
    params = _with_gain_scales(PARAMS, theta)
    s = quadx.init_state(params, CFG, jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3))
    s = quadx.set_mode(s, 7, CFG)
    s = s.replace(setpoint=jnp.array([TARGET[0], TARGET[1], 0.0, TARGET[2]]))

    def body(s, _):
        s, _ = quadx.step(s, params, CFG, mode=7)
        return s, jnp.sum((s.body.pos - TARGET) ** 2)

    _, errs = jax.lax.scan(body, s, None, length=T)
    return jnp.mean(errs)


def _theta0():
    z = {"kp": jnp.zeros(()), "ki": jnp.zeros(()), "kd": jnp.zeros(())}
    return {name: dict(z) for name in BANKS}


def test_grad_through_cascade_finite_and_nonzero():
    """Reverse-mode through step (PID cascade, motor lag, integrator, ground
    contact) is finite, and the position-error loss is sensitive to the
    position/altitude gains."""
    loss, grads = jax.jit(jax.value_and_grad(_step_response_loss))(_theta0())
    flat = jax.tree.leaves(grads)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert abs(float(grads["lin_pos"]["kp"])) > 1e-4
    assert abs(float(grads["z_pos"]["kp"])) > 1e-4


def test_bptt_pid_autotune_improves_step_response():
    """A few Adam steps on the gain scales must materially shrink the
    step-response tracking loss (measured: 0.33 -> 0.16 in 15 iters)."""
    vg = jax.jit(jax.value_and_grad(_step_response_loss))
    theta = _theta0()
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(0.05))
    ost = opt.init(theta)
    loss0 = None
    for _ in range(15):
        l, g = vg(theta)
        loss0 = l if loss0 is None else loss0
        up, ost = opt.update(g, ost)
        theta = optax.apply_updates(theta, up)
    lossT = vg(theta)[0]
    assert float(lossT) < 0.75 * float(loss0), (float(loss0), float(lossT))


def test_grad_wrt_mass_system_identification():
    """d(trajectory)/d(mass) flows: the altitude after a fixed-PWM burn is
    strictly decreasing in vehicle mass (gradient-based sysid hook)."""

    def final_z(mass):
        params = PARAMS.replace(mass=mass)
        s = quadx.init_state(params, CFG, jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3))
        pwm = jnp.full((4,), HOVER_PWM)
        s = s.replace(setpoint=pwm, throttle=pwm)

        def body(s, _):
            return quadx.step(s, params, CFG, mode=-1)[0], None

        s, _ = jax.lax.scan(body, s, None, length=60)
        return s.body.pos[2]

    g = float(jax.grad(final_z)(jnp.asarray(MASS)))
    assert np.isfinite(g)
    assert g < -1.0  # ~ -dz/dm: heavier quad ends measurably lower


# --------------------------------------------------- domain randomization
def test_vmap_over_params_domain_randomization():
    """Per-env vehicle parameters batch through vmap: a fleet with ±20%
    mass spread under the nominal hover PWM fans out in altitude, ordered
    inversely by mass."""
    n = 8
    masses = jnp.linspace(0.8 * MASS, 1.2 * MASS, n)
    params_b = jax.vmap(lambda m: PARAMS.replace(mass=m))(masses)

    def rollout(params):
        s = quadx.init_state(params, CFG, jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3))
        pwm = jnp.full((4,), HOVER_PWM)
        s = s.replace(setpoint=pwm, throttle=pwm)

        def body(s, _):
            return quadx.step(s, params, CFG, mode=-1)[0], None

        s, _ = jax.lax.scan(body, s, None, length=120)
        return s.body.pos[2]

    z = np.asarray(jax.jit(jax.vmap(rollout))(params_b))
    assert np.isfinite(z).all()
    # strictly monotone: lighter quads climb, heavier sink
    assert (np.diff(z) < 0).all(), z
    assert z[0] > 1.0 > z[-1]


def test_fixedwing_grad_safe_at_zero_airspeed():
    """The Khan aero model's freestream norm is exactly 0 at rest — the
    gradient must be finite (pins the lifting_surfaces safe_norm fix)."""
    fw_cfg = fixedwing.FixedwingConfig(noisy_motors=False)
    fw_params = fixedwing.build_params(fw_cfg)

    def final_x(throttle):
        s = fixedwing.init_state(
            fw_params, fw_cfg, jnp.asarray([0.0, 0.0, 50.0]), jnp.zeros(3),
            start_vel=jnp.zeros(3),  # at rest: freestream is exactly 0
        )
        s = s.replace(setpoint=jnp.array([0.0, 0.0, 0.0, throttle]))

        def body(s, _):
            return fixedwing.step(s, fw_params, fw_cfg, 0)[0], None

        s, _ = jax.lax.scan(body, s, None, length=24)
        return s.body.pos[0]

    g = float(jax.grad(final_x)(0.8))
    assert np.isfinite(g)
    assert g > 0.0  # more throttle, further downrange
