"""Round-5 Fixedwing-Waypoints RL on-chip (VERDICT r4 next-round #2).

The last env family without a trained-policy receipt. Standard PPO on the
XLA env (cached auto-reset), 2 recipes x 2 seeds x 0.75B env-steps,
deterministic full-episode evals every 50 updates (64 episodes), final
256-episode eval of final + best params, best params archived.

Scoring (reference workload:
/root/reference/PyFlyt/gym_envs/fixedwing_envs/fixedwing_waypoints_env.py:154-173):
  targets_mean — mean waypoints reached per episode (of 4)
  complete_rate — all 4 reached (env_complete; episode truncates + bonus)
  collision/oob rates — crash modes

Run (holds the TPU):
    timeout 10800 python docs/artifacts/fixedwing_rl_r5.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ART = "/root/repo/docs/artifacts"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

from pyflyt_tpu.envs.base import vec_reset  # noqa: E402
from pyflyt_tpu.envs.fixedwing_waypoints import FixedwingWaypointsEnv  # noqa: E402
from pyflyt_tpu.rl import PPO, PPOConfig, checkpoint  # noqa: E402
from pyflyt_tpu.rl.ppo import _flat_obs  # noqa: E402

OUT = f"{ART}/fixedwing_rl_r5_tpu.jsonl"
open(OUT, "w").close()


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:600], flush=True)


def make_eval(ppo, n):
    env = ppo.env

    @jax.jit
    def run(params, keys):
        st, obs = vec_reset(env, keys)

        def body(carry, _):
            st, obs, done, ep_rew = carry
            a = ppo.act_deterministic(params, _flat_obs(obs))
            st2, out = jax.vmap(env.step)(st, a)
            live = ~done
            ep_rew = ep_rew + out.reward * live
            done = done | out.termination | out.truncation
            return (st2, out.obs, done, ep_rew), None

        z = jnp.zeros(n, bool)
        (st, obs, done, ep_rew), _ = jax.lax.scan(
            body, (st, obs, z, jnp.zeros(n)), None, length=env.max_steps + 2
        )
        # the env freezes itself once done (base_step done_before select),
        # so the final state carries the episode-end task fields
        return st.wp.idx, st.env_complete, st.collision, st.out_of_bounds, ep_rew

    def evaluate(params, key):
        keys = jax.random.split(key, n)
        idx, complete, col, oob, ep_rew = run(params, keys)
        return {
            "episodes": n,
            "targets_mean": float(np.asarray(idx).mean()),
            "complete_rate": float(np.asarray(complete).mean()),
            "collision_rate": float(np.asarray(col).mean()),
            "oob_rate": float(np.asarray(oob).mean()),
            "mean_ep_reward": float(np.asarray(ep_rew).mean()),
        }

    return evaluate


ENV = FixedwingWaypointsEnv()
RECIPES = {
    "lr3e-4": PPOConfig(num_envs=4096, rollout_steps=128, num_epochs=4,
                        num_minibatches=16, learning_rate=3e-4,
                        clip_eps=0.2, init_log_std=-0.5,
                        cached_reset_refresh=64),
    "lr1e-4-tight": PPOConfig(num_envs=4096, rollout_steps=128,
                              num_epochs=4, num_minibatches=16,
                              learning_rate=1e-4, clip_eps=0.1,
                              init_log_std=-1.0, cached_reset_refresh=64),
}
BUDGET = 750_000_000
SEEDS = (0, 1)


def score(ev):
    return (ev["complete_rate"], ev["targets_mean"], ev["mean_ep_reward"])


for tag, cfg in RECIPES.items():
    ppo = PPO(ENV, cfg)
    it = jax.jit(ppo.train_iteration)
    eval64 = make_eval(ppo, 64)
    eval256 = make_eval(ppo, 256)
    for seed in SEEDS:
        runner = ppo.init(jax.random.PRNGKey(seed))
        per_update = cfg.batch_size
        updates = BUDGET // per_update
        rows = []
        best = None
        best_params = None
        t0 = time.time()
        for u in range(1, updates + 1):
            runner, m = it(runner)
            if u % 50 == 0 or u == updates:
                ev = eval64(
                    runner.params,
                    jax.random.fold_in(jax.random.PRNGKey(11), u),
                )
                row = {"update": u, "env_steps": u * per_update,
                       "steps_per_s": round(
                           u * per_update / (time.time() - t0)),
                       "mean_reward": float(m["mean_reward"]),
                       "entropy": float(m["entropy"]), **ev}
                rows.append(row)
                if best is None or score(ev) > best:
                    best = score(ev)
                    best_params = jax.tree.map(np.asarray, runner.params)
                print(tag, seed,
                      json.dumps({k: (round(v, 3) if isinstance(v, float)
                                      else v) for k, v in row.items()}),
                      flush=True)
        final = eval256(runner.params, jax.random.PRNGKey(999))
        final_best = eval256(
            jax.tree.map(jnp.asarray, best_params), jax.random.PRNGKey(999)
        )
        ckpt_path = f"{ART}/policies_fixedwing_r5_{tag}_seed{seed}"
        checkpoint.save(ckpt_path, {"params": best_params})
        emit({"stage": "B", "recipe": tag, "seed": seed,
              "config": {"lr": cfg.learning_rate, "clip": cfg.clip_eps,
                         "init_log_std": cfg.init_log_std},
              "train_wall_s": round(time.time() - t0),
              "final_eval_256": final,
              "best_eval_256": final_best,
              "best_ckpt": ckpt_path,
              "best_targets_mean": max((r["targets_mean"] for r in rows),
                                       default=0),
              "best_complete_rate": max((r["complete_rate"] for r in rows),
                                        default=0),
              "rows": rows})
        del runner
    del ppo, it
print("done", round(time.time() - T0), "s", flush=True)
