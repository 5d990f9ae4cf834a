"""Mod hovering env tests (reference:
PyFlyt/gym_envs/quadx_mod_envs/hovering/)."""

import jax
import jax.numpy as jnp
import numpy as np

from pyflyt_tpu.envs.quadx_mod import QuadXModHoveringEnv, hovering_pid_expert

ENV = QuadXModHoveringEnv(flight_mode=7, control_hz=40)


def test_reset_shapes_and_normalization():
    state, obs = ENV.reset(jax.random.PRNGKey(0))
    assert obs.shape == (16,)
    assert np.all(np.abs(np.asarray(obs)) <= 1.0 + 1e-6)  # normalized
    # spawn within 10 m of target
    err = np.linalg.norm(np.asarray(state.state16[12:15]))
    assert err < np.sqrt(3) * 10.0 + 1e-3


def test_unnormalized_obs():
    env = QuadXModHoveringEnv(flight_mode=7, normalize_obs=False)
    state, obs = env.reset(jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(obs), np.asarray(state.state16))


def test_reward_formula():
    """reward = 35 − 2·‖pos_err‖ − 0.1·‖v‖ − 4·|psi_err| − 0.1·‖ω‖
    (quadx_hovering_env.py:178-195)."""
    state, _ = ENV.reset(jax.random.PRNGKey(2))
    action = hovering_pid_expert(state.state16)
    state2, out = jax.jit(ENV.step)(state, action)
    s = np.asarray(state2.state16)
    expect = 35.0 + (
        -2.0 * np.linalg.norm(s[12:15])
        - 0.1 * np.linalg.norm(s[3:6])
        - 4.0 * abs(s[15])
        - 0.1 * np.linalg.norm(s[9:12])
    )
    if not bool(out.termination):
        np.testing.assert_allclose(float(out.reward), expect, rtol=1e-4)


def test_pid_expert_converges_to_target():
    """The mode-7 cascade driven by the PID expert must fly to the target:
    the RL-vs-PID baseline loop of the fork (quadx_hovering_pid_expert.py)."""
    env = QuadXModHoveringEnv(
        flight_mode=7, normalize_obs=False, normalize_actions=False,
        noisy_motors=False, max_duration_seconds=20.0,
    )
    state, obs = env.reset(jax.random.PRNGKey(3))
    err0 = np.linalg.norm(np.asarray(state.state16[12:15]))
    step = jax.jit(env.step)
    for _ in range(env.max_steps):
        action = hovering_pid_expert(state.state16)
        state, out = step(state, action)
        if bool(out.termination) or bool(out.truncation):
            break
    err = np.linalg.norm(np.asarray(state.state16[12:15]))
    psi_err = abs(float(state.state16[15]))
    assert err < 1.0, (err0, err)
    assert psi_err < 0.2
    assert not bool(state.collision)


def test_action_denormalization_mode8():
    env = QuadXModHoveringEnv(flight_mode=8, normalize_actions=True)
    a = jnp.asarray([-1.0, 0.0, 1.0, -1.0])
    denorm = env._denormalize_action(a)
    np.testing.assert_allclose(np.asarray(denorm), [0.0, 0.5, 1.0, 0.0], atol=1e-6)


def test_wind_changes_trajectory():
    """simulate_wind=True produces a different trajectory than no wind."""
    mk = lambda wind: QuadXModHoveringEnv(
        flight_mode=7, simulate_wind=wind, randomize_start=False,
        base_wind_velocities=(6.0, -6.0, 1.0), noisy_motors=False,
    )
    outs = []
    for wind in (False, True):
        env = mk(wind)
        state, _ = env.reset(jax.random.PRNGKey(5))
        step = jax.jit(env.step)
        for _ in range(40):
            state, out = step(state, jnp.asarray([0.0, 0.0, 0.0, 1.0]))
        outs.append(np.asarray(state.state16[:3]))
    assert np.linalg.norm(outs[0] - outs[1]) > 0.05


def test_determinism():
    env = QuadXModHoveringEnv(flight_mode=9)
    step = jax.jit(env.step)

    def rollout(seed):
        state, obs = env.reset(jax.random.PRNGKey(seed))
        rows = [np.asarray(obs)]
        for i in range(20):
            a = jnp.asarray([0.1, -0.1, 0.0, 0.2])
            state, out = step(state, a)
            rows.append(np.asarray(out.obs))
        return rows

    for o1, o2 in zip(rollout(11), rollout(11)):
        np.testing.assert_array_equal(o1, o2)


def test_logger_csv(tmp_path):
    from pyflyt_tpu.utils.hovering_logger import COLUMNS, HoveringLogger

    env = QuadXModHoveringEnv(flight_mode=7, normalize_obs=False)
    state, obs = env.reset(jax.random.PRNGKey(7))
    logger = HoveringLogger(str(tmp_path), make_plots=True)
    step = jax.jit(env.step)
    for i in range(5):
        action = hovering_pid_expert(state.state16)
        old = np.asarray(state.state16)
        state, out = step(state, action)
        logger.add(i, np.asarray(state.target_pos), float(state.target_psi),
                   old, np.asarray(action), float(out.reward))
    path = logger.log_episode()
    import csv as csv_mod

    with open(path) as f:
        rows = list(csv_mod.reader(f))
    assert rows[0] == COLUMNS
    assert len(rows) == 6
    import os

    assert os.path.exists(path.replace(".csv", ".png"))
