"""Tests for the QuadX Hover environment: determinism, semantics, batching."""

import jax
import jax.numpy as jnp
import numpy as np

from pyflyt_tpu.envs import autoreset_step, vec_reset
from pyflyt_tpu.envs.quadx_hover import QuadXHoverEnv

ENV = QuadXHoverEnv()
HOVER_T = float(np.sqrt(0.027 * 9.81 / 2.0))


def test_obs_shape_and_reset():
    state, obs = ENV.reset(jax.random.PRNGKey(0))
    assert obs.shape == (21,)  # 13 attitude(quat) + 4 action + 4 aux
    assert not bool(state.termination)
    # after 10 stabilization steps at min-pwm thrust the drone is falling
    assert float(state.drone.body.lin_vel[2]) < 0.0


def test_euler_obs_shape():
    env = QuadXHoverEnv(angle_representation="euler")
    _, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (20,)


def test_seeded_determinism():
    """Same seed ⇒ identical obs/reward/term/trunc over 50 steps
    (the reference's contract, tests/test_gym_envs.py:133-153)."""
    actions = jax.random.uniform(
        jax.random.PRNGKey(42), (50, 4), minval=-0.3, maxval=0.3
    )
    actions = actions.at[:, 3].set(HOVER_T)

    def rollout(seed):
        state, obs = ENV.reset(jax.random.PRNGKey(seed))
        rows = [obs]
        rews, terms = [], []
        step = jax.jit(ENV.step)
        for a in actions:
            state, out = step(state, a)
            rows.append(out.obs)
            rews.append(float(out.reward))
            terms.append(bool(out.termination))
        return np.array(rows), np.array(rews), np.array(terms)

    o1, r1, t1 = rollout(7)
    o2, r2, t2 = rollout(7)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(t1, t2)

    # different seed diverges (motor noise is seeded)
    o3, _, _ = rollout(8)
    assert not np.allclose(o1, o3)


def test_reward_semantics_shaped_per_inner_step():
    """Dense reward = −0.1 + Σ_inner (1 − dist − angdist); with 120/40 = 3
    inner steps the healthy-hover reward sits near −0.1 + 3·(1 − ~0 − ~0)."""
    env = QuadXHoverEnv(noisy_motors=False)
    state, _ = env.reset(jax.random.PRNGKey(0))
    action = jnp.asarray([0.0, 0.0, 0.0, HOVER_T])
    step = jax.jit(env.step)
    for _ in range(5):
        state, out = step(state, action)
    r = float(out.reward)
    assert 1.0 < r < 2.9, r  # 3 inner steps, some sag/tilt penalty


def test_collision_reward():
    """Crashing into the ground must yield reward −100 + termination."""
    env = QuadXHoverEnv(noisy_motors=False)
    state, _ = env.reset(jax.random.PRNGKey(0))
    action = jnp.zeros(4)  # no thrust -> fall from 1 m
    step = jax.jit(env.step)
    for _ in range(60):
        state, out = step(state, action)
        if bool(out.termination):
            break
    assert bool(out.termination)
    assert bool(out.info["collision"])
    # shaping applies after the -100 overwrite: -100 + 1 - dist - ang
    assert -102.0 < float(out.reward) < -98.0


def test_out_of_bounds():
    env = QuadXHoverEnv(noisy_motors=False, flight_dome_size=1.5)
    state, _ = env.reset(jax.random.PRNGKey(0))
    action = jnp.asarray([0.0, 0.0, 0.0, 0.8])  # full thrust -> fly up & out
    step = jax.jit(env.step)
    for _ in range(100):
        state, out = step(state, action)
        if bool(out.termination):
            break
    assert bool(out.termination) and bool(out.info["out_of_bounds"])


def test_truncation_at_max_duration():
    env = QuadXHoverEnv(noisy_motors=False, max_duration_seconds=1.0, flight_dome_size=100.0)
    state, _ = env.reset(jax.random.PRNGKey(0))
    action = jnp.asarray([0.0, 0.0, 0.0, HOVER_T])
    step = jax.jit(env.step)
    n = 0
    for _ in range(200):
        state, out = step(state, action)
        n += 1
        if bool(out.truncation) or bool(out.termination):
            break
    assert bool(out.truncation)
    # step_count > max_steps triggers truncation: max_steps+2 agent steps
    assert n == env.max_steps + 2, n


def test_vectorized_autoreset_rollout():
    """8 envs, 100 autoreset steps under one jit: shapes + progress sanity."""
    env = QuadXHoverEnv()
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    state, obs = vec_reset(env, keys)
    assert obs.shape == (8, 21)

    @jax.jit
    def run(state):
        def body(st, _):
            action = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, HOVER_T]), (8, 1))
            st, out = autoreset_step(env, st, action)
            return st, (out.reward, out.termination | out.truncation)

        return jax.lax.scan(body, state, None, length=100)

    state, (rewards, dones) = run(state)
    assert rewards.shape == (100, 8)
    assert np.isfinite(np.asarray(rewards)).all()
    # the batch keeps running after episode ends (auto-reset)
    assert not np.asarray(dones[-1]).all() or np.asarray(dones).sum() > 0


def test_gymnasium_wrapper_api():
    import gymnasium

    from pyflyt_tpu.envs.gym_wrapper import GymnasiumEnv

    genv = GymnasiumEnv(QuadXHoverEnv())
    obs, info = genv.reset(seed=3)
    assert genv.observation_space.contains(obs)
    for _ in range(10):
        action = genv.action_space.sample()
        obs, reward, term, trunc, info = genv.step(action)
        assert genv.observation_space.contains(obs)
        assert isinstance(reward, float)
        if term or trunc:
            break

    # registered ID
    from pyflyt_tpu.envs.gym_wrapper import register_envs

    register_envs()
    genv2 = gymnasium.make("PyFlyt/QuadX-Hover-v1")
    obs, _ = genv2.reset(seed=0)
    assert obs.shape == (21,)


def test_cached_autoreset_matches_distribution():
    """cached_autoreset_step: finished envs get fresh cached resets; obs of a
    done env equals a valid reset obs; cache refresh rotates."""
    from pyflyt_tpu.envs import autoreset_init, cached_autoreset_step

    env = QuadXHoverEnv(max_duration_seconds=0.25)  # truncates in 10 steps
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    ars, obs = jax.jit(lambda k: autoreset_init(env, k))(keys)
    step = jax.jit(lambda a, act: cached_autoreset_step(env, a, act, refresh=4))
    action = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, HOVER_T]), (16, 1))
    saw_done = False
    for i in range(25):
        ars, out = step(ars, action)
        done = np.asarray(out.termination | out.truncation)
        if done.any():
            saw_done = True
            # post-reset env state: step counter back to zero
            assert int(ars.env_state.step_count[np.argmax(done)]) == 0
        assert np.isfinite(np.asarray(out.obs)).all()
    assert saw_done


def test_cached_autoreset_episodes_diverge():
    """Two consecutive episodes of the same env slot must differ (the key is
    re-derived on cache consumption)."""
    from pyflyt_tpu.envs import autoreset_init, cached_autoreset_step

    env = QuadXHoverEnv(max_duration_seconds=0.25, noisy_motors=True)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    # long refresh period (> episode length): consecutive episodes consume the
    # SAME stale cache entry — they must still diverge via the key re-derive
    ars, obs = jax.jit(lambda k: autoreset_init(env, k))(keys)
    step = jax.jit(lambda a, act: cached_autoreset_step(env, a, act, refresh=1000))
    action = jnp.tile(jnp.asarray([0.1, 0.0, 0.0, HOVER_T]), (4, 1))
    rows = []
    for i in range(31):
        ars, out = step(ars, action)
        rows.append(np.asarray(out.obs[0]))
    # episode length 11 -> steps 10 and 21 are first steps of ep 2 and 3
    ep2, ep3 = rows[11], rows[22]
    assert not np.array_equal(ep2, ep3)


def test_long_rollout_stability():
    """5000 vectorized random-action steps with auto-reset stay finite —
    the numerical-robustness soak the reference never had."""
    from pyflyt_tpu.envs import autoreset_init, cached_autoreset_step

    env = QuadXHoverEnv(max_duration_seconds=2.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 32)
    ars, _ = jax.jit(lambda k: autoreset_init(env, k))(keys)

    @jax.jit
    def chunk(ars, key):
        def body(carry, _):
            a, key = carry
            key, sub = jax.random.split(key)
            act = jax.random.uniform(
                sub, (32, 4), minval=-3.0, maxval=3.0
            ).at[:, 3].set(jax.random.uniform(sub, (32,), maxval=0.8))
            a, out = cached_autoreset_step(env, a, act, refresh=4)
            return (a, key), (out.reward, out.obs)
        (ars, key), (rews, obs) = jax.lax.scan(
            body, (ars, key), None, length=500
        )
        return ars, key, rews, obs

    key = jax.random.PRNGKey(7)
    for _ in range(10):  # 5000 steps total
        ars, key, rews, obs = chunk(ars, key)
        assert bool(jnp.all(jnp.isfinite(rews)))
        assert bool(jnp.all(jnp.isfinite(obs)))
