"""Round-4 self-play dogfight part B: the cached arena-spawn pool.

Part A measured the exact-reset self-play iteration at 1.9-2.1M
agent-steps/s — the per-step vmapped XLA arena reset (recomputed whether
or not any arena finished) is the gap to the bare kernel. This probe
races the amortized pool (selfplay_dogfight.cached_autoreset_step,
refresh=64) against the exact path IN ONE PROCESS, then repeats the 0.6B
training + duel run on the cached path to confirm training health.

Run (holds the TPU):
    timeout 7200 python docs/artifacts/dogfight_selfplay_r4b.py
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

OUT = f"{ART}/dogfight_selfplay_r4b_tpu.jsonl"
open(OUT, "w").close()


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


def mk_args(num_envs, cached):
    return types.SimpleNamespace(
        sparse_reward=False, noisy_motors=True, damage_per_hit=0.02,
        max_duration_seconds=60.0, agent_hz=30, layer_size=256,
        num_of_layers=2, init_log_std=-1.0, num_envs=num_envs,
        rollout_steps=128, n_epochs=4, num_minibatches=16,
        learning_rate=3e-4, clip_eps=0.2, entropy_coef=0.0,
        cached_reset_refresh=cached,
    )


ROWS = 8192
setups = {}
for tag, cached in (("exact", 0), ("cached64", 64)):
    args = mk_args(ROWS, cached)
    env = ds.build_env(args)
    ppo = ds.mk_ppo(args, env)
    runner = ppo.init(jax.random.PRNGKey(0))
    it = jax.jit(ppo.train_iteration)
    setups[tag] = (args, env, ppo, runner, it)

for tag, (args, env, ppo, runner, it) in setups.items():
    jax.block_until_ready(jax.tree.leaves(it(runner)))
    print("warm", tag, round(time.time() - T0), "s", flush=True)

times = {t: [] for t in setups}
for rep in range(5):
    for tag, (args, env, ppo, runner, it) in setups.items():
        t0 = time.perf_counter()
        out = it(runner)
        jax.block_until_ready(jax.tree.leaves(out))
        times[tag].append(time.perf_counter() - t0)

for tag, (args, *_r) in setups.items():
    ts = sorted(times[tag])
    med = ts[len(ts) // 2]
    emit({"stage": "A", "config": tag, "agent_rows": ROWS,
          "ms_per_iter_median": round(med * 1e3, 1),
          "agent_steps_per_s": round(ROWS * args.rollout_steps / med),
          "spread_ms": [round(x * 1e3, 1) for x in ts]})
del setups

# ---- stage B: cached-path training health -----------------------------------
args = mk_args(ROWS, 64)
env = ds.build_env(args)
ppo = ds.mk_ppo(args, env)
runner = ppo.init(jax.random.PRNGKey(0))
init_params = jax.tree.map(lambda x: x, runner.params)
it = jax.jit(ppo.train_iteration)
apply_init = lambda o: ppo.act_deterministic(init_params, o)  # noqa: E731

BUDGET = 600_000_000
per_update = ROWS * args.rollout_steps
updates = BUDGET // per_update
rows_out = []
t0 = time.time()
for u in range(1, updates + 1):
    runner, m = it(runner)
    if u % 100 == 0 or u == updates:
        params = runner.params
        apply_t = lambda o: ppo.act_deterministic(params, o)  # noqa: E731
        duel = ds.evaluate_versus(
            env, apply_t, apply_init,
            jax.random.fold_in(jax.random.PRNGKey(7), u), 128,
        )
        row = {"update": u, "agent_steps": u * per_update,
               "steps_per_s": round(u * per_update / (time.time() - t0)),
               "mean_reward": float(m["mean_reward"]),
               **{f"duel_{k}": v for k, v in duel.items()}}
        rows_out.append(row)
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in row.items()}), flush=True)

params = runner.params
apply_t = lambda o: ppo.act_deterministic(params, o)  # noqa: E731
final = ds.evaluate_versus(
    env, apply_t, apply_init, jax.random.PRNGKey(99), 256
)
emit({"stage": "B", "cached_reset_refresh": 64,
      "budget_agent_steps": BUDGET,
      "train_wall_s": round(time.time() - t0),
      "final_duel_vs_init": final,
      "rows": rows_out})
print("done", round(time.time() - T0), "s", flush=True)
