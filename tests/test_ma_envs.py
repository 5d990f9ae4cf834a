"""Multi-agent env tests (reference: PyFlyt/pz_envs/). Covers the functional
cores and the PettingZoo shim, incl. the reference's parallel_api_test."""

import jax
import jax.numpy as jnp
import numpy as np

from pyflyt_tpu.envs.ma_fixedwing_dogfight import (
    MAFixedwingDogfightEnv,
    compute_rotation_forward,
)
from pyflyt_tpu.envs.ma_quadx_hover import MAQuadXHoverEnv
from pyflyt_tpu.envs.pz_wrapper import (
    make_ma_fixedwing_dogfight,
    make_ma_quadx_hover,
)

HOVER = MAQuadXHoverEnv()


def test_hover_reset_shapes():
    state, obs = HOVER.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 23)  # euler: 12 + 4 aux + 4 past act + 3 start
    assert bool(jnp.all(state.alive))


def test_hover_reward_near_start():
    """Hovering drones near their start points earn ~+1 per inner step."""
    state, obs = HOVER.reset(jax.random.PRNGKey(1))
    hover_t = float(np.sqrt(0.027 * 9.81 / 2.0))
    actions = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, hover_t]), (4, 1))
    step = jax.jit(HOVER.step)
    state, out = step(state, actions)
    # 3 inner steps, each ≈ (1 - small dist) -> positive, < 3
    assert np.all(np.asarray(out.reward) > 0.0)
    assert np.all(np.asarray(out.reward) <= 3.0)


def test_hover_collision_and_culling():
    """Two drones on top of each other collide: −100·inner steps and culled."""
    state, obs = HOVER.reset(jax.random.PRNGKey(2))
    # teleport drone 1 onto drone 0
    body = state.drones.body
    pos = body.pos.at[1].set(body.pos[0])
    state = state.replace(drones=state.drones.replace(body=body.replace(pos=pos)))
    actions = jnp.zeros((4, 4))
    state, out = jax.jit(HOVER.step)(state, actions)
    term = np.asarray(out.termination)
    rew = np.asarray(out.reward)
    assert term[0] and term[1]
    assert rew[0] < -100.0 and rew[1] < -100.0
    assert not bool(state.alive[0]) and not bool(state.alive[1])
    assert bool(state.alive[2]) and bool(state.alive[3])


def test_hover_determinism():
    step = jax.jit(HOVER.step)
    actions = jnp.tile(jnp.asarray([0.1, -0.1, 0.0, 0.4]), (4, 1))

    def rollout(seed):
        state, obs = HOVER.reset(jax.random.PRNGKey(seed))
        rows = []
        for _ in range(8):
            state, out = step(state, actions)
            rows.append((np.asarray(out.obs), np.asarray(out.reward)))
        return rows

    for (o1, r1), (o2, r2) in zip(rollout(7), rollout(7)):
        np.testing.assert_array_equal(o1, o2)
        np.testing.assert_array_equal(r1, r2)


# ---------------------------------------------------------------------------
# dogfight
# ---------------------------------------------------------------------------

DOG = MAFixedwingDogfightEnv()


def test_dogfight_reset():
    state, obs = DOG.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 30)
    pos = np.asarray(state.drones.read.view[:, 3, :])
    sep = np.linalg.norm(pos[0] - pos[1])
    assert sep > 0.2 * DOG.flight_dome_size * 0.8  # spawn separation (pre-stab)
    assert np.allclose(np.asarray(state.health), 1.0)


def test_rotation_forward_matches_reference_formula():
    """compute_rotation_forward vs the reference's explicit matrices
    (ma_fixedwing_dogfight_env.py:321-356)."""
    rng = np.random.default_rng(0)
    orn = rng.uniform(-1.5, 1.5, size=(5, 3))
    R, fwd = compute_rotation_forward(jnp.asarray(orn, dtype=jnp.float32))
    c, s = np.cos(orn), np.sin(orn)
    for i in range(5):
        rx = np.eye(3); rx[1, 1] = c[i, 0]; rx[1, 2] = -s[i, 0]; rx[2, 1] = s[i, 0]; rx[2, 2] = c[i, 0]
        ry = np.eye(3); ry[0, 0] = c[i, 1]; ry[0, 2] = s[i, 1]; ry[2, 0] = -s[i, 1]; ry[2, 2] = c[i, 1]
        rz = np.eye(3); rz[0, 0] = c[i, 2]; rz[0, 1] = -s[i, 2]; rz[1, 0] = s[i, 2]; rz[1, 1] = c[i, 2]
        np.testing.assert_allclose(np.asarray(R[i]), rz @ ry @ rx, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(fwd[i]),
            [c[i, 2] * c[i, 1], s[i, 2] * c[i, 1], -s[i, 1]],
            atol=1e-6,
        )


def test_dogfight_hit_mechanics():
    """Place agent 0 directly behind agent 1 aiming at it: agent 0 scores
    hits (+30 / −20 rewards) and agent 1 loses health."""
    state, obs = DOG.reset(jax.random.PRNGKey(3))
    # straight-line setup: both flying +x, 0 ahead -> 1
    view = state.drones.read.view
    body = state.drones.body
    quat = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (2, 1))
    pos = jnp.asarray([[0.0, 0.0, 15.0], [8.0, 0.0, 15.0]])
    from pyflyt_tpu.models import fixedwing as fw

    com = DOG.params.com_offset
    body = body.replace(
        pos=pos + com,  # identity rotation: com offset adds directly
        quat=quat,
        lin_vel=jnp.tile(jnp.asarray([15.0, 0.0, 0.0]), (2, 1)),
        ang_vel=jnp.zeros((2, 3)),
    )
    drones = state.drones.replace(
        body=body,
        read=fw.update_state(body, DOG.params, DOG.cfg, state.drones.physics_steps),
    )
    state = state.replace(drones=drones)
    state = DOG._agent_states(state)
    assert bool(state.current_hits[0])  # 0 has 1 in its cone, in range, chasing
    assert not bool(state.current_hits[1])  # 1 faces away from 0
    assert float(state.health[1]) < 1.0
    # step and check reward signs
    actions = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.8]), (2, 1))
    state2, out = jax.jit(DOG.step)(state, actions)
    rew = np.asarray(out.reward)
    healths = np.asarray(state2.health)
    if bool(np.asarray(out.info["collision"]).any()) is False:
        assert healths[1] <= float(state.health[1])


def test_dogfight_determinism():
    step = jax.jit(DOG.step)
    actions = jnp.tile(jnp.asarray([0.0, 0.1, 0.0, 0.7]), (2, 1))

    def rollout(seed):
        state, obs = DOG.reset(jax.random.PRNGKey(seed))
        rows = []
        for _ in range(6):
            state, out = step(state, actions)
            rows.append((np.asarray(out.obs), np.asarray(out.reward)))
        return rows

    for (o1, r1), (o2, r2) in zip(rollout(9), rollout(9)):
        np.testing.assert_array_equal(o1, o2)
        np.testing.assert_array_equal(r1, r2)


def test_dogfight_unassisted_flight():
    """``assisted_flight=False``: 6-dim actions, 32-dim obs, and the
    reference quirk preserved — the trajectory matches the assisted env on
    the shared first 4 action dims because the mode-0 assist map ignores
    dims 4-5 (ma_fixedwing_base_env.py:216, fixedwing.py:224-225)."""
    raw = MAFixedwingDogfightEnv(assisted_flight=False)
    assert raw.action_size == 6 and raw.obs_size == 32

    state_r, obs_r = raw.reset(jax.random.PRNGKey(4))
    state_a, obs_a = DOG.reset(jax.random.PRNGKey(4))
    assert obs_r.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(obs_r[:, :26]), np.asarray(obs_a[:, :26]))

    a4 = jnp.tile(jnp.asarray([0.1, -0.05, 0.02, 0.7]), (2, 1))
    # dims 4-5 are dead: fill them with garbage, trajectories must agree
    a6 = jnp.concatenate(
        [a4, jnp.asarray([[0.9, 0.3], [-0.7, 1.0]], a4.dtype)], axis=-1
    )
    step_r = jax.jit(raw.step)
    step_a = jax.jit(DOG.step)
    for i in range(4):
        state_r, out_r = step_r(state_r, a6)
        state_a, out_a = step_a(state_a, a4)
        np.testing.assert_allclose(
            np.asarray(out_r.obs[:, :26]), np.asarray(out_a.obs[:, :26]),
            err_msg=f"step {i}",
        )
        np.testing.assert_allclose(
            np.asarray(out_r.reward), np.asarray(out_a.reward),
            err_msg=f"step {i}",
        )


# ---------------------------------------------------------------------------
# PettingZoo shim
# ---------------------------------------------------------------------------


def test_pz_hover_api():
    env = make_ma_quadx_hover()
    obs, infos = env.reset(seed=0)
    assert set(obs.keys()) == {"uav_0", "uav_1", "uav_2", "uav_3"}
    actions = {a: env.action_space(a).sample() * 0.1 for a in env.agents}
    obs, rew, term, trunc, info = env.step(actions)
    assert set(rew.keys()) == set(obs.keys())
    assert all(isinstance(v, float) for v in rew.values())


def test_pz_parallel_api_conformance():
    """The reference's own conformance gate
    (tests/test_pz_envs.py:56-69 → pettingzoo parallel_api_test)."""
    from pettingzoo.test import parallel_api_test

    env = make_ma_quadx_hover(max_duration_seconds=2.0)
    parallel_api_test(env, num_cycles=60)


def test_pz_dogfight_runs_episode():
    env = make_ma_fixedwing_dogfight(max_duration_seconds=3.0)
    obs, infos = env.reset(seed=1)
    steps = 0
    while env.agents and steps < 200:
        actions = {a: np.array([0.0, 0.0, 0.0, 0.8]) for a in env.agents}
        obs, rew, term, trunc, info = env.step(actions)
        steps += 1
    assert steps > 0
    for a, i in info.items():
        assert "healths" in i and np.asarray(i["healths"]).shape == (2,)


def test_pz_dogfight_api_conformance():
    """parallel_api_test over the dogfight too (the reference gates both MA
    envs — tests/test_pz_envs.py:56-69)."""
    from pettingzoo.test import parallel_api_test

    env = make_ma_fixedwing_dogfight(max_duration_seconds=2.0)
    parallel_api_test(env, num_cycles=40)


def test_pz_render_and_gunsight_recolor():
    """rgb_array overview render + the reference's gunsight hit recolor
    (ma_fixedwing_dogfight_env.py:383-394: red [1,0,0,.2] while scoring a
    hit, black [0,0,0,.2] otherwise)."""
    env = make_ma_fixedwing_dogfight(
        max_duration_seconds=3.0, render_mode="rgb_array"
    )
    env.reset(seed=2)
    env.step({a: np.array([0.0, 0.0, 0.0, 0.8]) for a in env.agents})
    frame = env.render()
    assert frame.shape == (480, 480, 4) and frame.dtype == np.uint8

    # scene_boxes colors flip with current_hits
    state = env._state
    boxes_none = env.fenv.scene_boxes(state)
    np.testing.assert_allclose(
        np.asarray(boxes_none.colors), [[0, 0, 0, 0.2]] * 2, atol=1e-6
    )
    hit_state = state.replace(current_hits=jnp.asarray([True, False]))
    boxes_hit = env.fenv.scene_boxes(hit_state)
    np.testing.assert_allclose(
        np.asarray(boxes_hit.colors), [[1, 0, 0, 0.2], [0, 0, 0, 0.2]],
        atol=1e-6,
    )


def test_pz_hover_render():
    env = make_ma_quadx_hover(render_mode="rgb_array")
    env.reset(seed=0)
    frame = env.render()
    assert frame.shape == (480, 480, 4) and frame.dtype == np.uint8
