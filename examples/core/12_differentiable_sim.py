"""Auto-tune PID gains by backpropagating through the simulator.

No reference counterpart CAN exist: the reference's physics lives behind
PyBullet's C++ boundary, so gradients stop at `stepSimulation`. Here the
entire cascade (PID banks -> motor mixing -> first-order motor lag -> 6-DoF
integration -> ground contact) is one differentiable JAX program, so
``jax.grad`` of a tracking loss with respect to the controller gains is just
reverse-mode AD through the rollout (BPTT).

The demo tunes per-bank gain scales for a mode-7 position step response;
~30 Adam steps cut the tracking loss by ~60%. The same pattern gives
gradient-based system identification (grad w.r.t. mass/inertia/tau — see
tests/test_differentiable.py::test_grad_wrt_mass_system_identification).
"""

import jax
import jax.numpy as jnp
import optax

from pyflyt_tpu.models import quadx

CFG = quadx.QuadXConfig(noisy_motors=False)
PARAMS = quadx.build_params(CFG)
BANKS = ("ang_vel", "ang_pos", "lin_vel", "lin_pos", "z_pos", "z_vel")
TARGET = jnp.array([0.4, -0.4, 1.6])  # step target from spawn (0, 0, 1)
HORIZON = 180  # control steps = 1.5 s


def with_gain_scales(params, theta):
    """Multiplies each PID bank's (kp, ki, kd) by exp(theta[bank])."""
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


def tracking_loss(theta):
    """Mean squared position error over the whole step response."""
    params = with_gain_scales(PARAMS, theta)
    s = quadx.init_state(params, CFG, jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3))
    s = quadx.set_mode(s, 7, CFG)
    s = s.replace(setpoint=jnp.array([TARGET[0], TARGET[1], 0.0, TARGET[2]]))

    def body(s, _):
        s, _ = quadx.step(s, params, CFG, mode=7)  # BPTT goes through here
        return s, jnp.sum((s.body.pos - TARGET) ** 2)

    _, sq_err = jax.lax.scan(body, s, None, length=HORIZON)
    return jnp.mean(sq_err)


theta = {
    name: {"kp": jnp.zeros(()), "ki": jnp.zeros(()), "kd": jnp.zeros(())}
    for name in BANKS
}
opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(0.05))
opt_state = opt.init(theta)
value_and_grad = jax.jit(jax.value_and_grad(tracking_loss))

for i in range(31):
    loss, grads = value_and_grad(theta)
    updates, opt_state = opt.update(grads, opt_state)
    theta = optax.apply_updates(theta, updates)
    if i % 5 == 0:
        print(f"iter {i:3d}  tracking loss {float(loss):.4f}")

print("\ntuned gain scales (exp(theta)):")
for name in BANKS:
    s = {k: round(float(jnp.exp(v)), 3) for k, v in theta[name].items()}
    print(f"  {name:8s} {s}")
