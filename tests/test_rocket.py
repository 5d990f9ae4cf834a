"""Rocket model + landing env tests
(reference: PyFlyt/core/drones/rocket.py, abstractions/boosters.py,
abstractions/gimbals.py, gym_envs/rocket_envs/)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pyflyt_tpu.envs.rocket_landing import RocketLandingEnv
from pyflyt_tpu.models import rocket
from pyflyt_tpu.ops import boosters, gimbals

CFG = rocket.RocketConfig(noisy_boosters=False, starting_fuel_ratio=1.0)
PARAMS = rocket.build_params(CFG)


# ---------------------------------------------------------------------------
# boosters
# ---------------------------------------------------------------------------


def _booster_step(state, ignition, pwm, n=1):
    out = None
    for _ in range(n):
        state, thrust, fuel_mass, fuel_inertia = boosters.update(
            state, PARAMS.booster, jnp.asarray([ignition]), jnp.asarray([pwm]),
            CFG.physics_period,
        )
    return state, thrust


def test_booster_min_thrust_floor():
    """Lit boosters idle at min_thrust (ratio_min_throttle floor,
    boosters.py:227-229)."""
    st = boosters.init(PARAMS.booster)
    st, thrust = _booster_step(st, 1.0, 0.0, n=200)  # converge the lag
    np.testing.assert_allclose(float(thrust[0]), 2966.7, rtol=1e-3)


def test_booster_full_throttle():
    st = boosters.init(PARAMS.booster)
    st, thrust = _booster_step(st, 1.0, 1.0, n=200)
    np.testing.assert_allclose(float(thrust[0]), 7607.0, rtol=1e-3)


def test_booster_off_without_ignition():
    st = boosters.init(PARAMS.booster)
    st, thrust = _booster_step(st, 0.0, 1.0, n=50)
    assert float(thrust[0]) == 0.0


def test_booster_fuel_cutoff():
    """Thrust dies when the tank is dry (boosters.py:244)."""
    st = boosters.init(PARAMS.booster, starting_fuel_ratio=1e-5)
    st, thrust = _booster_step(st, 1.0, 1.0, n=300)
    assert float(st.ratio_fuel_remaining[0]) == 0.0
    assert float(thrust[0]) == 0.0


def test_booster_fuel_burn_rate():
    """dfuel/dt = throttle · max_fuel_rate/total_fuel (boosters.py:246-250)."""
    st = boosters.init(PARAMS.booster)
    for _ in range(240):
        st, thrust, *_ = boosters.update(
            st, PARAMS.booster, jnp.asarray([1.0]), jnp.asarray([1.0]),
            CFG.physics_period,
        )
    burn = 1.0 - float(st.ratio_fuel_remaining[0])
    np.testing.assert_allclose(burn, 1.451 / 410.9, rtol=0.02)


# ---------------------------------------------------------------------------
# gimbals
# ---------------------------------------------------------------------------


def test_gimbal_rotation_axes():
    """Full deflection about unit-1 (x axis) rotates the thrust unit by the
    5° range in the y-z plane (gimbals.py:141-211)."""
    gs = gimbals.init(PARAMS.gimbal)
    cmd = jnp.asarray([[1.0, 0.0]])
    for _ in range(400):  # converge the τ=0.01 lag
        gs, rot = gimbals.compute_rotation(gs, cmd, PARAMS.gimbal, CFG.physics_period)
    thrust = np.asarray(rot[0] @ np.array([0.0, 0.0, 1.0]))
    angle = np.rad2deg(np.arccos(np.clip(thrust[2], -1, 1)))
    np.testing.assert_allclose(angle, 5.0, atol=0.1)
    assert abs(thrust[0]) < 1e-6  # rotation about x keeps x-component zero


def test_gimbal_identity_at_zero():
    gs = gimbals.init(PARAMS.gimbal)
    _, rot = gimbals.compute_rotation(
        gs, jnp.zeros((1, 2)), PARAMS.gimbal, CFG.physics_period
    )
    np.testing.assert_allclose(np.asarray(rot[0]), np.eye(3), atol=1e-6)


# ---------------------------------------------------------------------------
# composite mass properties
# ---------------------------------------------------------------------------


def test_mass_properties_track_fuel():
    full_m, full_com, full_I = rocket.mass_properties(
        PARAMS, jnp.asarray([410.9]), jnp.asarray([[1678.0, 1678.0, 7.01]])
    )
    dry_m, dry_com, dry_I = rocket.mass_properties(
        PARAMS, jnp.asarray([0.0]), jnp.asarray([[0.0, 0.0, 0.0]])
    )
    np.testing.assert_allclose(float(full_m), 549.1, rtol=1e-4)
    np.testing.assert_allclose(float(dry_m), 138.2, rtol=1e-3)
    # dry rocket's CoM sits lower (booster is a larger mass fraction)
    assert float(dry_com[2]) < float(full_com[2])
    assert float(full_I[0, 0]) > float(dry_I[0, 0])


def test_finlet_x_steers_descent():
    """finlet_x command in fast descending flow generates lateral x force
    (the finlet map routes setpoint[0] to the lift-along-x fin pair,
    rocket.py:148-155). NOTE: the yaw channel is a no-op in the reference —
    its quirky surface link ids (rocket.py:118,131) put every fin force
    through the roll axis — and we reproduce that."""
    cfg = dataclasses.replace(CFG, starting_fuel_ratio=0.01)
    st = rocket.init_state(
        PARAMS, cfg, jnp.asarray([0.0, 0.0, 300.0]), jnp.zeros(3),
        start_lin_vel=jnp.asarray([0.0, 0.0, -100.0]),
    )
    st = st.replace(setpoint=jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    def f(s, _):
        s, *_ = rocket.step(s, PARAMS, cfg)
        return s, None
    st, _ = jax.lax.scan(f, st, None, length=60)
    vx_world = float(st.body.lin_vel[0])
    assert abs(vx_world) > 0.3


# ---------------------------------------------------------------------------
# landing env
# ---------------------------------------------------------------------------

ENV = RocketLandingEnv()


def test_env_reset_obs():
    state, obs = ENV.reset(jax.random.PRNGKey(0))
    assert obs.shape == (33,)  # 13 + 7 + 9 + 1 + 3
    view = np.asarray(state.drone.read.view)
    assert 350.0 < view[3, 2] < 460.0  # dropped from 0.8-0.9 ceiling
    assert view[2, 2] < -80.0  # accelerate_drop imparted ~ -100 m/s


def test_env_determinism():
    step = jax.jit(ENV.step)
    action = jnp.asarray([0.0, 0.0, 0.0, 1.0, 0.5, 0.0, 0.0])

    def rollout(seed):
        state, _ = ENV.reset(jax.random.PRNGKey(seed))
        rows = []
        for _ in range(10):
            state, out = step(state, action)
            rows.append((np.asarray(out.obs), float(out.reward)))
        return rows

    for (o1, r1), (o2, r2) in zip(rollout(5), rollout(5)):
        np.testing.assert_array_equal(o1, o2)
        assert r1 == r2


def test_crash_is_fatal():
    """Free-falling into the ground terminates with fatal_collision and no
    completion (rocket_base_env.py:288-295)."""
    state, _ = ENV.reset(jax.random.PRNGKey(1))
    step = jax.jit(ENV.step)
    action = jnp.zeros(7)
    for i in range(ENV.max_steps):
        state, out = step(state, action)
        if bool(out.termination) or bool(out.truncation):
            break
    assert bool(out.termination)
    assert bool(out.info["fatal_collision"])
    assert not bool(out.info["env_complete"])


def test_soft_landing_rewards_500():
    """A rocket resting upright on the pad with ~zero velocity completes the
    episode with the +500 bonus (rocket_landing_env.py:249-258)."""
    state, _ = ENV.reset(jax.random.PRNGKey(2))
    pad = state.pad_position
    pad_top = float(pad[2]) + 0.05
    # place the base so the leg tips (z=-2.425 body) sit just above the pad
    base_z = pad_top + 2.43
    drone = state.drone
    com = rocket._current_com(drone, ENV.params)
    body = drone.body.replace(
        pos=jnp.asarray([float(pad[0]), float(pad[1]), base_z]) + com,
        quat=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
        lin_vel=jnp.zeros(3),
        ang_vel=jnp.zeros(3),
    )
    drone = drone.replace(
        body=body, read=rocket.update_state(body, ENV.params, ENV.cfg, com,
                                            drone.physics_steps)
    )
    state = state.replace(drone=drone)
    state = ENV._compute_state_fields(state)
    state = ENV._compute_state_fields(state)  # settle prev_* to current

    step = jax.jit(ENV.step)
    action = jnp.zeros(7)
    got_complete, got_500 = False, False
    for _ in range(20):
        state, out = step(state, action)
        got_complete |= bool(out.info["env_complete"])
        got_500 |= float(out.reward) > 400.0
        if bool(out.termination):
            break
    assert got_complete and got_500


def test_vmap_batch():
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    state, obs = jax.vmap(ENV.reset)(keys)
    assert obs.shape == (4, 33)
    act = jnp.zeros((4, 7)).at[:, 3].set(1.0).at[:, 4].set(0.8)
    state, out = jax.jit(jax.vmap(ENV.step))(state, act)
    assert out.reward.shape == (4,)
    assert not np.isnan(np.asarray(out.obs)).any()


def test_landing_reward_terms():
    """Loiter penalty −5, pad-offset 2/(d+0.1), xy-progress ×100, spin/tilt
    penalties (rocket_landing_env.py:193-219) — checked against a hand
    recomputation over one agent step with zero thrust."""
    env = RocketLandingEnv()
    state, _ = env.reset(jax.random.PRNGKey(11))
    step = jax.jit(env.step)
    st2, out = step(state, jnp.zeros(7))
    if bool(out.termination):
        return  # crashed already; nothing to decompose
    # replay the final inner step's terms
    view = np.asarray(st2.drone.read.view)
    dist_xy = np.linalg.norm(np.asarray(st2.distance[:2]))
    prev_xy = np.linalg.norm(np.asarray(st2.prev_distance[:2]))
    per_step = (
        -5.0
        + 2.0 / (dist_xy + 0.1)
        + 100.0 * (prev_xy - dist_xy)
        - abs(view[0, 2])
        - 3.0 * np.linalg.norm(view[1, :2])
    )
    # the reward is a sum over 3 inner steps of terms of this magnitude;
    # check it's within the plausible envelope of 3 such terms
    assert -3 * 20.0 < float(out.reward) < 3 * 25.0
    # and that the last inner step's recomputation is close to reward/3 when
    # dynamics vary slowly (free fall, high altitude)
    np.testing.assert_allclose(float(out.reward) / 3.0, per_step, atol=3.0)
