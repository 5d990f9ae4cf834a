"""Domain randomization: a fleet where every drone has different physics.

The reference can only randomize what its URDF loader exposes, one process
per variant. Here vehicle parameters are an ordinary pytree argument of
``quadx.step``, so ``jax.vmap`` batches PHYSICS PARAMETERS exactly like
state: one fused XLA program simulates a fleet whose masses, motor time
constants, and drag coefficients all differ per env — the standard recipe
for sim-to-real robust policy training.
"""

import jax
import jax.numpy as jnp

from pyflyt_tpu.models import quadx

CFG = quadx.QuadXConfig(noisy_motors=False)
NOMINAL = quadx.build_params(CFG)
N = 1024

key = jax.random.PRNGKey(0)
k_mass, k_tau, k_drag = jax.random.split(key, 3)

# ±20% mass, ±50% motor lag, ±30% drag — all per-env
mass = NOMINAL.mass * jax.random.uniform(k_mass, (N,), minval=0.8, maxval=1.2)
tau = NOMINAL.motor.tau * jax.random.uniform(k_tau, (N, 4), minval=0.5, maxval=1.5)
drag = NOMINAL.drag_const_xyz * jax.random.uniform(
    k_drag, (N, 3), minval=0.7, maxval=1.3
)

params = jax.vmap(
    lambda m, t, d: NOMINAL.replace(
        mass=m, motor=NOMINAL.motor.replace(tau=t), drag_const_xyz=d
    )
)(mass, tau, drag)


def rollout(params):
    """Mode-7 hold at the spawn point for 2 s; returns the final position."""
    s = quadx.init_state(params, CFG, jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3))
    s = quadx.set_mode(s, 7, CFG)
    s = s.replace(setpoint=jnp.array([0.0, 0.0, 0.0, 1.0]))

    def body(s, _):
        return quadx.step(s, params, CFG, mode=7)[0], None

    s, _ = jax.lax.scan(body, s, None, length=240)
    return s.body.pos


final_pos = jax.jit(jax.vmap(rollout))(params)
err = jnp.linalg.norm(final_pos - jnp.array([0.0, 0.0, 1.0]), axis=-1)
print(f"{N} randomized drones, mode-7 hold for 2 s:")
print(f"  position error: mean {float(err.mean()):.3f} m, "
      f"p95 {float(jnp.percentile(err, 95)):.3f} m, "
      f"max {float(err.max()):.3f} m")
print(f"  heaviest drone sagged to z={float(final_pos[jnp.argmax(mass), 2]):.3f}, "
      f"lightest at z={float(final_pos[jnp.argmin(mass), 2]):.3f}")
