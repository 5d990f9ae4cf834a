"""PPO trainer tests: machinery, sharding, and a small learning check
(reference pipeline: PyFlyt/rl_training/hovering/training.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pyflyt_tpu.envs.quadx_hover import QuadXHoverEnv
from pyflyt_tpu.rl.ppo import PPO, PPOConfig

SMALL = PPOConfig(
    num_envs=16,
    rollout_steps=8,
    num_epochs=2,
    num_minibatches=4,
    feature_sizes=(32, 32),
)


def _make():
    return PPO(QuadXHoverEnv(max_duration_seconds=2.0), SMALL)


def test_init_shapes():
    ppo = _make()
    runner = ppo.init(jax.random.PRNGKey(0))
    assert runner.obs.shape == (16, 21)
    flat = jax.tree.leaves(runner.params)
    assert all(jnp.all(jnp.isfinite(p)) for p in flat)


def test_train_iteration_runs_and_updates():
    ppo = _make()
    runner = ppo.init(jax.random.PRNGKey(0))
    before = jax.tree.leaves(runner.params)[0].copy()
    runner2, metrics = jax.jit(ppo.train_iteration)(runner)
    assert int(runner2.update_idx) == 1
    after = jax.tree.leaves(runner2.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    for k in ("loss", "pg_loss", "v_loss", "entropy", "mean_reward"):
        assert np.isfinite(float(metrics[k])), k


def test_evaluate():
    ppo = _make()
    runner = ppo.init(jax.random.PRNGKey(0))
    stats = jax.jit(ppo.evaluate, static_argnums=2)(
        runner.params, jax.random.PRNGKey(1), 4
    )
    assert np.isfinite(float(stats["mean_reward"]))
    assert 1.0 <= float(stats["mean_length"]) <= ppo.env.max_steps + 1


def test_evaluate_requires_max_steps():
    """evaluate() refuses to guess an episode horizon: an env without
    max_steps raises instead of silently truncating at the old 400-step
    fallback (VERDICT r2 weak-item 5)."""
    import pytest

    ppo = _make()
    runner = ppo.init(jax.random.PRNGKey(0))

    class NoHorizon:
        def __getattr__(self, name):
            if name == "max_steps":
                raise AttributeError(name)
            return getattr(ppo.env, name)

    broken = PPO.__new__(PPO)
    broken.__dict__.update(ppo.__dict__)
    broken.env = NoHorizon()
    with pytest.raises(AttributeError, match="max_steps"):
        broken.evaluate(runner.params, jax.random.PRNGKey(1), 2)


def test_mesh_sharded_train_iteration():
    """The full train step compiles and runs with env state sharded over the
    8-device CPU mesh (the driver's dryrun contract)."""
    from jax.sharding import Mesh

    ppo = _make()
    runner = ppo.init(jax.random.PRNGKey(0))
    mesh = Mesh(np.array(jax.devices()[:8]), ("env",))
    runner = ppo.shard_runner(runner, mesh)
    runner, metrics = jax.jit(ppo.train_iteration)(runner)
    jax.block_until_ready(runner.params)
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tmp_path):
    from pyflyt_tpu.rl import checkpoint

    ppo = _make()
    runner = ppo.init(jax.random.PRNGKey(0))
    runner, _ = jax.jit(ppo.train_iteration)(runner)
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, runner)
    template = ppo.init(jax.random.PRNGKey(9))
    restored = checkpoint.restore(path, template)
    a = jax.tree.leaves(runner.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.update_idx) == 1


def test_warm_start_restore_params(tmp_path):
    """restore_params grafts a checkpoint's policy into a run with a
    DIFFERENT num_envs/horizon — the reference's PPO.load fine-tune pattern
    (rl_training/trajectory_following_slow/training.py:206-211)."""
    from pyflyt_tpu.rl import checkpoint

    ppo = _make()
    runner = ppo.init(jax.random.PRNGKey(0))
    runner, _ = jax.jit(ppo.train_iteration)(runner)
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, runner)

    # new run: different env count and episode horizon, same network
    cfg2 = dataclasses.replace(SMALL, num_envs=8, rollout_steps=4)
    ppo2 = PPO(QuadXHoverEnv(max_duration_seconds=1.0), cfg2)
    fresh = ppo2.init(jax.random.PRNGKey(7))
    params = checkpoint.restore_params(path, fresh.params)
    for a, b in zip(jax.tree.leaves(runner.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    warm = fresh.replace(params=params)
    warm, metrics = jax.jit(ppo2.train_iteration)(warm)
    assert np.isfinite(float(metrics["loss"]))

    # mismatched architecture must be rejected, not silently grafted
    cfg3 = dataclasses.replace(SMALL, feature_sizes=(16, 16))
    ppo3 = PPO(QuadXHoverEnv(max_duration_seconds=1.0), cfg3)
    bad = ppo3.init(jax.random.PRNGKey(3))
    try:
        checkpoint.restore_params(path, bad.params)
    except ValueError as e:
        assert "mismatch" in str(e) or "architecture" in str(e)
    else:
        raise AssertionError("shape mismatch not detected")


def test_learning_improves_hover():
    """A short PPO run on QuadX-Hover must improve the evaluation return —
    the end-to-end learning sanity check."""
    cfg = PPOConfig(
        num_envs=64,
        rollout_steps=64,
        num_epochs=4,
        num_minibatches=8,
        learning_rate=1e-3,
        entropy_coef=0.0,
        feature_sizes=(64, 64),
    )
    env = QuadXHoverEnv(max_duration_seconds=3.0, noisy_motors=False)
    ppo = PPO(env, cfg)
    runner = ppo.init(jax.random.PRNGKey(0))
    it = jax.jit(ppo.train_iteration)
    rewards = []
    for _ in range(30):
        runner, metrics = it(runner)
        rewards.append(float(metrics["mean_reward"]))
    # skip the first iterations: fresh envs start near the hover point, so the
    # reward first *drops* as episodes churn, then recovers with learning
    # (observed ≈ −1.7 → −0.8 over 40 iterations at this config)
    early = np.mean(rewards[4:9])
    late = np.mean(rewards[-6:])
    assert late > early + 0.1, (early, late, rewards)


def test_cached_reset_rollout():
    """PPO with the amortized auto-reset trains and shards."""
    import dataclasses

    from jax.sharding import Mesh

    cfg = dataclasses.replace(SMALL, cached_reset_refresh=2)
    ppo = PPO(QuadXHoverEnv(max_duration_seconds=2.0), cfg)
    runner = ppo.init(jax.random.PRNGKey(0))
    mesh = Mesh(np.array(jax.devices()[:8]), ("env",))
    runner = ppo.shard_runner(runner, mesh)
    runner, metrics = jax.jit(ppo.train_iteration)(runner)
    jax.block_until_ready(runner.params)
    assert np.isfinite(float(metrics["loss"]))
    assert int(runner.update_idx) == 1


def test_log_std_clamp():
    """log_std_range hard-caps the effective std the policy samples with."""
    cfg = PPOConfig(
        num_envs=16, rollout_steps=8, num_epochs=2, num_minibatches=4,
        feature_sizes=(32, 32), init_log_std=1.5, log_std_range=(-2.0, -1.0),
    )
    ppo = PPO(QuadXHoverEnv(max_duration_seconds=2.0), cfg)
    runner = ppo.init(jax.random.PRNGKey(0))
    obs = runner.obs
    _, log_std, _ = ppo.network.apply(runner.params, obs)
    # init 1.5 is above the max → clamped to -1.0 everywhere
    np.testing.assert_allclose(np.asarray(log_std), -1.0)
    # and a train iteration still runs with the clamp in the graph
    runner2, metrics = jax.jit(ppo.train_iteration)(runner)
    assert np.isfinite(float(metrics["loss"]))


def test_param_ema_and_early_stop(tmp_path):
    """train() with a Polyak parameter shadow: eval_ema_* metrics appear,
    a best_model_ema_* checkpoint is written, and early_stop_patience=1
    halts the run at the first non-improving eval (with lr=0 the evals are
    iid draws, so 30 strict improvements in a row can't happen)."""
    import dataclasses

    from pyflyt_tpu.rl import TrainConfig, train

    cfg = dataclasses.replace(SMALL, learning_rate=0.0)
    ppo = PPO(QuadXHoverEnv(max_duration_seconds=2.0), cfg)
    rows = []
    runner = train(
        ppo,
        TrainConfig(
            total_timesteps=30 * cfg.batch_size,
            eval_every_updates=1,
            eval_episodes=2,
            log_dir=str(tmp_path),
            param_ema=0.5,
            early_stop_patience=1,
            seed=0,
        ),
        on_metrics=lambda u, row: rows.append(row),
    )
    assert rows, "no eval rows recorded"
    assert "eval_ema_mean_reward" in rows[0]
    assert np.isfinite(rows[0]["eval_ema_mean_reward"])
    assert int(runner.update_idx) < 30, "early stopping never triggered"
    ema_ckpts = list(tmp_path.glob("best_model_ema_*"))
    assert ema_ckpts, "no EMA best-model checkpoint written"
    # with lr=0 params never move, so the EMA shadow equals the raw params
    # and both checkpoints hold the same policy
    raw_ckpts = [p for p in tmp_path.glob("best_model_*")
                 if "ema" not in p.name]
    assert raw_ckpts


def test_average_params(tmp_path):
    """checkpoint.average_params returns the element-wise mean of the
    params subtrees of several checkpoints."""
    from pyflyt_tpu.rl import checkpoint

    ppo = _make()
    r1 = ppo.init(jax.random.PRNGKey(0))
    r2 = ppo.init(jax.random.PRNGKey(1))
    p1, p2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    checkpoint.save(p1, r1)
    checkpoint.save(p2, r2)
    avg = checkpoint.average_params([p1, p2], r1.params)
    for a, b, m in zip(
        jax.tree.leaves(r1.params),
        jax.tree.leaves(r2.params),
        jax.tree.leaves(avg),
    ):
        np.testing.assert_allclose(
            np.asarray(m), (np.asarray(a) + np.asarray(b)) / 2.0, rtol=1e-6
        )


def test_slot_bootstrap_matches_inscan():
    """PPOConfig.slot_bootstrap (one deferred V(term_obs) apply on a
    carried per-env slot) must reproduce the per-step in-scan bootstrap
    exactly — same (B, obs) matmul shapes, same additions — across rollouts
    that span episode boundaries (max_steps=40 > rollout_steps=32, so the
    truncations land mid-rollout from the second iteration on)."""
    env = QuadXHoverEnv(max_duration_seconds=1.0, agent_hz=40)
    cfg = dataclasses.replace(
        SMALL, rollout_steps=32, num_envs=8, num_epochs=1, num_minibatches=2
    )
    trajs = {}
    for slot in (False, True):
        ppo = PPO(env, dataclasses.replace(cfg, slot_bootstrap=slot))
        runner = ppo.init(jax.random.PRNGKey(3))
        roll = jax.jit(ppo._rollout)
        it = jax.jit(ppo.train_iteration)
        runner, _ = it(runner)  # cross the episode boundary
        runner, traj = roll(runner)
        trajs[slot] = traj
    assert float(jnp.sum(trajs[False].done)) > 0  # boundaries were crossed
    for name in ("obs", "action", "value", "log_prob", "done"):
        a = np.asarray(getattr(trajs[False], name))
        b = np.asarray(getattr(trajs[True], name))
        np.testing.assert_array_equal(a, b, err_msg=name)
    # rewards agree to FMA-rounding level: in-scan fuses r + γ·v·mask into
    # an FMA (one rounding), the deferred scatter-add rounds twice
    np.testing.assert_allclose(
        np.asarray(trajs[False].reward), np.asarray(trajs[True].reward),
        rtol=1e-6, atol=1e-6,
    )


def test_slot_bootstrap_auto_select_respects_truncation_shape():
    """slot_bootstrap=None (auto) must only pick the slot path for envs
    whose truncation fires at most once per env per rollout (advisor r4,
    medium): plain FunctionalEnvs truncate only on the time limit, but a
    native-batch adapter like SelfPlayDogfightEnv truncates on partner
    death arbitrarily often and must fall back to the in-scan apply."""
    cfg = dataclasses.replace(SMALL, rollout_steps=8)

    env = QuadXHoverEnv(max_duration_seconds=1.0, agent_hz=40)  # 40 steps
    assert PPO(env, cfg)._use_slot() is True
    # rollout covers whole episodes -> nothing to defer
    assert PPO(
        env, dataclasses.replace(cfg, rollout_steps=64)
    )._use_slot() is False

    from pyflyt_tpu.envs.quadx_mod.packed_hovering import (
        PackedQuadXModHoveringEnv,
    )
    from pyflyt_tpu.envs.selfplay_dogfight import SelfPlayDogfightEnv

    packed = PackedQuadXModHoveringEnv.create(flight_mode=9)
    assert packed.time_limit_truncation_only is True
    assert PPO(packed, cfg)._use_slot() is True

    sp = SelfPlayDogfightEnv()
    assert sp.time_limit_truncation_only is False
    assert PPO(sp, cfg)._use_slot() is False  # auto must NOT pick slot
    # an unknown native-batch adapter (no declaration) defaults to safe
    class Anon:
        native_batch = True

        def __init__(self, inner):
            self._inner = inner
            self.max_steps = inner.max_steps

        def action_bounds(self):
            return self._inner.action_bounds()

    assert PPO(Anon(sp), cfg)._use_slot() is False
    # explicit config always wins over auto
    assert PPO(
        sp, dataclasses.replace(cfg, slot_bootstrap=True)
    )._use_slot() is True
