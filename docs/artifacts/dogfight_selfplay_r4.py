"""Round-4 self-play dogfight RL on-chip: train + win-rate-vs-init curve.

The reference ships the MA dogfight with no training pipeline; this
trains it by self-play through the standard PPO (envs/selfplay_dogfight
adapter over the fused dogfight kernel) and scores checkpoints by
full-match duels against the FROZEN UNTRAINED policy
(rl_training/dogfight_selfplay.evaluate_versus: death-based scoring —
shot down / collision / out-of-dome — with health-margin tiebreak).

  A — self-play train-iteration throughput at 4096 and 8192 agent rows.
  B — train ~0.6B agent-steps at the better config; eval-vs-init (128
      matches) every 50 updates; final 256-match duel.

Run (holds the TPU):
    timeout 7200 python docs/artifacts/dogfight_selfplay_r4.py
"""

import json
import sys
import time
import types

sys.path.insert(0, "/root/repo")

import jax

ART = "/root/repo/docs/artifacts"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

from pyflyt_tpu.rl_training import dogfight_selfplay as ds  # noqa: E402

OUT = f"{ART}/dogfight_selfplay_r4_tpu.jsonl"
open(OUT, "w").close()


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


def mk_args(num_envs):
    return types.SimpleNamespace(
        sparse_reward=False, noisy_motors=True, damage_per_hit=0.02,
        max_duration_seconds=60.0, agent_hz=30, layer_size=256,
        num_of_layers=2, init_log_std=-1.0, num_envs=num_envs,
        rollout_steps=128, n_epochs=4, num_minibatches=16,
        learning_rate=3e-4, clip_eps=0.2, entropy_coef=0.0,
    )


def timeit(fn, *a, reps=3):
    out = fn(*a)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.perf_counter() - t0) / reps


# ---- stage A ----------------------------------------------------------------
best_rows, best_sps = 4096, 0.0
for rows in (4096, 8192):
    args = mk_args(rows)
    env = ds.build_env(args)
    ppo = ds.mk_ppo(args, env)
    runner = ppo.init(jax.random.PRNGKey(0))
    it = jax.jit(ppo.train_iteration)
    dt = timeit(it, runner)
    sps = args.num_envs * args.rollout_steps / dt
    if sps > best_sps:
        best_rows, best_sps = rows, sps
    emit({"stage": "A", "agent_rows": rows, "arenas": rows // 2,
          "ms_per_iter": round(dt * 1e3, 1),
          "agent_steps_per_s": round(sps)})
    del runner, ppo, it, env

# ---- stage B ----------------------------------------------------------------
args = mk_args(best_rows)
env = ds.build_env(args)
ppo = ds.mk_ppo(args, env)
runner = ppo.init(jax.random.PRNGKey(0))
init_params = jax.tree.map(lambda x: x, runner.params)
it = jax.jit(ppo.train_iteration)

apply_init = lambda o: ppo.act_deterministic(init_params, o)  # noqa: E731

BUDGET = 600_000_000
per_update = args.num_envs * args.rollout_steps
updates = BUDGET // per_update
rows_out = []
t0 = time.time()
for u in range(1, updates + 1):
    runner, m = it(runner)
    if u % 50 == 0 or u == updates:
        params = runner.params
        apply_t = lambda o: ppo.act_deterministic(params, o)  # noqa: E731
        duel = ds.evaluate_versus(
            env, apply_t, apply_init,
            jax.random.fold_in(jax.random.PRNGKey(7), u), 128,
        )
        row = {
            "update": u,
            "agent_steps": u * per_update,
            "steps_per_s": round(u * per_update / (time.time() - t0)),
            "mean_reward": float(m["mean_reward"]),
            "entropy": float(m["entropy"]),
            **{f"duel_{k}": v for k, v in duel.items()},
        }
        rows_out.append(row)
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in row.items()}), flush=True)

params = runner.params
apply_t = lambda o: ppo.act_deterministic(params, o)  # noqa: E731
final = ds.evaluate_versus(
    env, apply_t, apply_init, jax.random.PRNGKey(99), 256
)
emit({"stage": "B", "agent_rows": best_rows,
      "budget_agent_steps": BUDGET,
      "train_wall_s": round(time.time() - t0),
      "final_duel_vs_init": final,
      "best_win_rate": max((r["duel_win_rate_a"] for r in rows_out),
                           default=None),
      "rows": rows_out})
print("done", round(time.time() - T0), "s", flush=True)
