"""Round-5 self-play league (VERDICT r4 stretch #9).

The r4 result (256/256 duels) was vs the untrained init — a weak
yardstick. This trains the validated cached-pool recipe with periodic
frozen snapshots and plays the full round-robin league:

  pool = [init, 25%, 50%, 75%, 100%] of a 0.9B-agent-step run
  every ordered pair duels 256 matches (death-based scoring,
  rl_training.dogfight_selfplay.evaluate_versus)

Non-degenerate bar: each later checkpoint beats every earlier one
(win_rate > 0.5 row-wise above the diagonal), with the init column worst.
No reference counterpart; pure extension.

Run (holds the TPU):
    timeout 7200 python docs/artifacts/dogfight_league_r5.py
"""

import json
import sys
import time
import types

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

ART = "/root/repo/docs/artifacts"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

from pyflyt_tpu.rl import checkpoint  # noqa: E402
from pyflyt_tpu.rl_training import dogfight_selfplay as ds  # noqa: E402

OUT = f"{ART}/dogfight_league_r5_tpu.jsonl"
open(OUT, "w").close()


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:700], flush=True)


ROWS = 8192
args = types.SimpleNamespace(
    sparse_reward=False, noisy_motors=True, damage_per_hit=0.02,
    max_duration_seconds=60.0, agent_hz=30, layer_size=256,
    num_of_layers=2, init_log_std=-1.0, num_envs=ROWS,
    rollout_steps=128, n_epochs=4, num_minibatches=16,
    learning_rate=3e-4, clip_eps=0.2, entropy_coef=0.0,
    cached_reset_refresh=64,
)
env = ds.build_env(args)
ppo = ds.mk_ppo(args, env)
runner = ppo.init(jax.random.PRNGKey(0))
it = jax.jit(ppo.train_iteration)

BUDGET = 900_000_000
per_update = args.num_envs * args.rollout_steps
updates = BUDGET // per_update
snap_at = sorted({updates // 4, updates // 2, 3 * updates // 4, updates})
pool = {"init": jax.tree.map(np.asarray, runner.params)}

t0 = time.time()
for u in range(1, updates + 1):
    runner, m = it(runner)
    if u in snap_at:
        jax.block_until_ready(jax.tree.leaves(runner.params))
        tag = f"s{round(100 * u / updates)}"
        pool[tag] = jax.tree.map(np.asarray, runner.params)
        emit({"stage": "snapshot", "tag": tag, "update": u,
              "agent_steps": u * per_update,
              "steps_per_s": round(u * per_update / (time.time() - t0)),
              "mean_reward": float(m["mean_reward"]),
              "entropy": float(m["entropy"])})

ckpt_path = f"{ART}/policies_dogfight_league_r5"
checkpoint.save(ckpt_path, {"params": pool[max(pool, key=lambda k: 0
                                               if k == "init" else
                                               int(k[1:]))]})

# ---- round-robin league ------------------------------------------------------
# ONE compiled duel program taking both param trees as arguments (reusing
# ds.evaluate_versus would recompile its closed-over applies per pair)
import jax.numpy as jnp  # noqa: E402

N_MATCH = 256
penv = env.penv


@jax.jit
def duel_run(pa, pb, keys):
    st, obs = penv.reset(keys)

    def body(carry, _):
        st, obs, done, health_end, dead_end = carry
        act = jnp.stack(
            [ppo.act_deterministic(pa, obs[:, 0]),
             ppo.act_deterministic(pb, obs[:, 1])], axis=1
        )
        st, out = penv.step(st, act)
        own_done = out.termination | out.truncation
        now = jnp.any(own_done, axis=1)
        fresh = (now & ~done)[:, None]
        healths = out.info["healths"][:, 0, :]
        health_end = jnp.where(fresh, healths, health_end)
        # deaths, not termination flags — the env terminates the SURVIVOR
        # via other_dead (see rl_training.dogfight_selfplay.evaluate_versus)
        dead_now = (
            (healths <= 0.0) | out.info["collision"]
            | out.info["out_of_bounds"]
        )
        dead_end = jnp.where(fresh, dead_now, dead_end)
        return (st, out.obs, done | now, health_end, dead_end), None

    init = (st, obs, jnp.zeros(N_MATCH, bool), jnp.ones((N_MATCH, 2)),
            jnp.zeros((N_MATCH, 2), bool))
    (st, obs, done, health_end, dead_end), _ = jax.lax.scan(
        body, init, None, length=env.max_steps + 2
    )
    return done, health_end, dead_end


def duel(pa, pb, key):
    keys = jax.random.split(key, N_MATCH)
    done, health_end, dead_end = duel_run(pa, pb, keys)
    h = np.asarray(health_end)
    dead = np.asarray(dead_end)
    margin = h[:, 0] - h[:, 1]
    wins = (dead[:, 1] & ~dead[:, 0]) | (
        (dead[:, 1] == dead[:, 0]) & (margin > 1e-6)
    )
    losses = (dead[:, 0] & ~dead[:, 1]) | (
        (dead[:, 0] == dead[:, 1]) & (margin < -1e-6)
    )
    return {
        "matches": N_MATCH,
        "finished": int(np.asarray(done).sum()),
        "win_rate_a": float(wins.mean()),
        "loss_rate_a": float(losses.mean()),
        "draw_rate": float((~wins & ~losses).mean()),
        "mean_health_margin_a": float(np.mean(margin)),
    }


names = list(pool.keys())  # insertion order: init, s25, s50, s75, s100
matrix = {}
for a in names:
    for b in names:
        if a == b:
            continue
        pa = jax.tree.map(jnp.asarray, pool[a])
        pb = jax.tree.map(jnp.asarray, pool[b])
        d = duel(pa, pb,
                 jax.random.fold_in(jax.random.PRNGKey(7),
                                    names.index(a) * 16 + names.index(b)))
        matrix[f"{a}_vs_{b}"] = d
        print(a, "vs", b, json.dumps({k: round(v, 3) if isinstance(v, float)
                                      else v for k, v in d.items()}),
              flush=True)

# symmetric win rate (average of both seat assignments)
win = {}
for i, a in enumerate(names):
    for j, b in enumerate(names):
        if i >= j:
            continue
        w_ab = matrix[f"{a}_vs_{b}"]["win_rate_a"]
        l_ba = matrix[f"{b}_vs_{a}"]["loss_rate_a"]
        win[f"{a}>{b}"] = round((w_ab + l_ba) / 2.0, 3)

later_beats_earlier = all(
    win[f"{a}>{b}"] < 0.5
    for i, a in enumerate(names) for b in names[i + 1:]
)
emit({"stage": "league", "names": names,
      "pairwise_sym_win": win,
      "later_beats_earlier": bool(later_beats_earlier),
      "matrix": {k: {kk: round(vv, 3) if isinstance(vv, float) else vv
                     for kk, vv in v.items()} for k, v in matrix.items()},
      "final_ckpt": ckpt_path})
print("done", round(time.time() - T0), "s", flush=True)
