"""Waypoint handler + QuadX Waypoints env tests
(reference: PyFlyt/gym_envs/utils/waypoint_handler.py, quadx_waypoints_env.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pyflyt_tpu.envs.quadx_waypoints import QuadXWaypointsEnv
from pyflyt_tpu.envs.utils.waypoints import WaypointHandler


def test_target_sampling_bounds():
    """Targets lie in the dome with z floored at 0.1
    (waypoint_handler.py:66-77)."""
    wph = WaypointHandler(num_targets=64, flight_dome_size=5.0)
    ws = wph.reset(jax.random.PRNGKey(0))
    t = np.asarray(ws.targets)
    r = np.linalg.norm(t, axis=-1)
    assert (r <= 5.0 * 0.9 + 1e-5).all()
    assert (t[:, 2] >= 0.1 - 1e-6).all()


def test_distance_and_progress():
    wph = WaypointHandler(num_targets=2, flight_dome_size=5.0)
    ws = wph.reset(jax.random.PRNGKey(1))
    target0 = ws.targets[0]
    zero3 = jnp.zeros(3)
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])

    ws, deltas = wph.update_distances(ws, zero3, zero3, ident)
    np.testing.assert_allclose(
        float(ws.new_distance), float(jnp.linalg.norm(target0)), rtol=1e-6
    )
    # step to halfway: progress = old - new = d/2
    halfway = target0 / 2.0
    ws, deltas = wph.update_distances(ws, zero3, halfway, ident)
    np.testing.assert_allclose(
        float(wph.progress_to_target(ws)),
        float(jnp.linalg.norm(target0)) / 2.0,
        rtol=1e-5,
    )


def test_body_frame_deltas():
    """target_deltas = (targets - lin_pos) @ R (waypoint_handler.py:117-121):
    a drone yawed +90° sees a target ahead in world-x at body -y."""
    wph = WaypointHandler(num_targets=1)
    ws = wph.reset(jax.random.PRNGKey(2))
    ws = ws.replace(targets=jnp.asarray([[1.0, 0.0, 0.0]]))
    from pyflyt_tpu.core import math as pm

    yaw90 = jnp.asarray([0.0, 0.0, jnp.pi / 2])
    ws, deltas = wph.update_distances(
        ws, yaw90, jnp.zeros(3), pm.euler_to_quat(yaw90)
    )
    np.testing.assert_allclose(np.asarray(deltas[0]), [0.0, -1.0, 0.0], atol=1e-6)


def test_reach_advance_cycle():
    wph = WaypointHandler(num_targets=2, goal_reach_distance=0.2)
    ws = wph.reset(jax.random.PRNGKey(3))
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    # stand on target 0
    ws, _ = wph.update_distances(ws, jnp.zeros(3), ws.targets[0], ident)
    assert bool(wph.target_reached(ws))
    ws = wph.advance_targets(ws)
    assert int(wph.num_targets_reached(ws)) == 1
    assert not bool(wph.all_targets_reached(ws))
    # stand on target 1
    ws, _ = wph.update_distances(ws, jnp.zeros(3), ws.targets[1], ident)
    assert bool(wph.target_reached(ws))
    ws = wph.advance_targets(ws)
    assert bool(wph.all_targets_reached(ws))


def test_remaining_deltas_roll_and_mask():
    wph = WaypointHandler(num_targets=3)
    ws = wph.reset(jax.random.PRNGKey(4))
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    ws, deltas = wph.update_distances(ws, jnp.zeros(3), jnp.zeros(3), ident)
    ws = wph.advance_targets(ws)  # one reached
    rem = wph.remaining_deltas(ws, deltas)
    np.testing.assert_allclose(np.asarray(rem[0]), np.asarray(deltas[1]))
    np.testing.assert_allclose(np.asarray(rem[1]), np.asarray(deltas[2]))
    np.testing.assert_allclose(np.asarray(rem[2]), 0.0)


def test_yaw_targets():
    wph = WaypointHandler(num_targets=1, use_yaw_targets=True, goal_reach_angle=0.1)
    ws = wph.reset(jax.random.PRNGKey(5))
    ws = ws.replace(yaw_targets=jnp.asarray([3.0]))
    ident = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    # wraparound: drone yaw -3.0 vs target 3.0 -> error wraps to ~0.283
    ang_pos = jnp.asarray([0.0, 0.0, -3.0])
    ws, deltas = wph.update_distances(ws, ang_pos, ws.targets[0], ident)
    assert deltas.shape == (1, 4)
    np.testing.assert_allclose(
        float(ws.yaw_error), 2 * np.pi - 6.0, rtol=1e-4
    )
    assert not bool(wph.target_reached(ws))


# ---------------------------------------------------------------------------
# env-level
# ---------------------------------------------------------------------------

ENV = QuadXWaypointsEnv()


def test_env_reset_obs():
    state, obs = ENV.reset(jax.random.PRNGKey(0))
    assert obs["attitude"].shape == (21,)
    assert obs["target_deltas"].shape == (4, 3)
    # all four targets visible at reset
    assert not bool(jnp.all(obs["target_deltas"][3] == 0.0))


def test_env_seeded_determinism():
    step = jax.jit(ENV.step)
    actions = jax.random.uniform(jax.random.PRNGKey(9), (20, 4), minval=-0.2, maxval=0.2)

    def rollout(seed):
        state, obs = ENV.reset(jax.random.PRNGKey(seed))
        traj = []
        for a in actions:
            state, out = step(state, a)
            traj.append(
                (out.obs["attitude"], out.obs["target_deltas"], out.reward)
            )
        return traj

    for (a1, d1, r1), (a2, d2, r2) in zip(rollout(5), rollout(5)):
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_env_reach_gives_100_and_truncates():
    """Plant the drone's hover point on the last remaining target: reward must
    hit 100 on the reach step and truncation when all targets are reached."""
    env = QuadXWaypointsEnv(num_targets=1, goal_reach_distance=0.5, flight_mode=7)
    state, obs = env.reset(jax.random.PRNGKey(3))
    # teleport target onto the spawn hover position
    ws = state.wp.replace(targets=jnp.asarray([[0.0, 0.0, 1.0]]))
    state = state.replace(wp=ws)
    # mode 7 position setpoint at the target
    action = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    step = jax.jit(env.step)
    rewards, truncs, completes = [], [], []
    for _ in range(10):
        state, out = step(state, action)
        rewards.append(float(out.reward))
        truncs.append(bool(out.truncation))
        completes.append(bool(out.info["env_complete"]))
    assert max(rewards) == 100.0
    assert any(truncs)
    assert any(completes)
    assert int(state.wp.idx) == 1


def test_env_vmap():
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    state, obs = jax.vmap(ENV.reset)(keys)
    assert obs["target_deltas"].shape == (8, 4, 3)
    actions = jnp.zeros((8, 4))
    state, out = jax.jit(jax.vmap(ENV.step))(state, actions)
    assert out.reward.shape == (8,)


def test_flatten_waypoint_env():
    """Flatten wrapper: attitude + context_length zero-padded deltas
    (reference: gym_envs/utils/flatten_waypoint_env.py, context 2 and 8
    tested at tests/test_gym_envs.py:156-171)."""
    from pyflyt_tpu.envs.utils.flatten_waypoints import FlattenWaypointEnv

    for ctx in (2, 8):
        env = FlattenWaypointEnv(QuadXWaypointsEnv(num_targets=4), context_length=ctx)
        state, obs = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (21 + ctx * 3,)
        if ctx > 4:  # rows beyond num_targets are zero padding
            np.testing.assert_array_equal(np.asarray(obs[21 + 4 * 3:]), 0.0)
        state, out = jax.jit(env.step)(state, jnp.zeros(4))
        assert out.obs.shape == obs.shape
