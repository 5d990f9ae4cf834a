"""Round-4 rocket-landing RL on-chip: can PPO land the booster?

The reference ships Rocket-Landing as a gym env with no RL recipe; this
trains it with the standard PPO (XLA env + generic cached auto-reset —
no new plumbing) and scores deterministic policies by landing tiers over
full episodes:

  pad     — touched the landing pad at all (reward +20 path)
  soft    — pad contact below the fatal thresholds (survived touchdown)
  complete— the env's own success flag (stable upright rest: |v|<0.02,
            |w|<0.02, tilt<0.1 — the +500 bonus, rocket_landing.py:141-148)

  A — PPO train-iteration throughput at 4096 envs.
  B — two recipes x 0.75B env-steps with landing-tier evals every 50
      updates (64 episodes each) + a final 256-episode eval.

Run (holds the TPU):
    timeout 9000 python docs/artifacts/rocket_rl_r4.py
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
from pyflyt_tpu.envs.rocket_landing import RocketLandingEnv  # noqa: E402
from pyflyt_tpu.rl import PPO, PPOConfig  # noqa: E402

OUT = f"{ART}/rocket_rl_r4_tpu.jsonl"
open(OUT, "w").close()


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


def landing_eval(ppo, params, key, n=64):
    env = ppo.env
    keys = jax.random.split(key, n)

    @jax.jit
    def run(keys):
        st, obs = vec_reset(env, keys)

        def body(carry, _):
            st, obs, done, complete, pad, fatal, ep_rew = carry
            a = ppo.act_deterministic(params, obs)
            st2, out = jax.vmap(env.step)(st, a)
            live = ~done
            complete = complete | (out.info["env_complete"] & live)
            pad = pad | ((st2.pad_contact_flag > 0.5) & live)
            fatal = fatal | (out.info["fatal_collision"] & live)
            ep_rew = ep_rew + out.reward * live
            done = done | out.termination | out.truncation
            return (st2, out.obs, done, complete, pad, fatal, ep_rew), None

        z = jnp.zeros(n, bool)
        init = (st, obs, z, z, z, z, jnp.zeros(n))
        (st, obs, done, complete, pad, fatal, ep_rew), _ = jax.lax.scan(
            body, init, None, length=env.max_steps + 2
        )
        return complete, pad, fatal, ep_rew

    complete, pad, fatal, ep_rew = run(keys)
    pad_np = np.asarray(pad)
    fatal_np = np.asarray(fatal)
    return {
        "episodes": n,
        "pad_rate": float(pad_np.mean()),
        "soft_rate": float((pad_np & ~fatal_np).mean()),
        "complete_rate": float(np.asarray(complete).mean()),
        "fatal_rate": float(fatal_np.mean()),
        "mean_ep_reward": float(np.asarray(ep_rew).mean()),
    }


ENV = RocketLandingEnv()
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

# ---- stage A ----------------------------------------------------------------
ppo = PPO(ENV, RECIPES["lr3e-4"])
runner = ppo.init(jax.random.PRNGKey(0))
it = jax.jit(ppo.train_iteration)
out = it(runner)
jax.block_until_ready(jax.tree.leaves(out))
t0 = time.perf_counter()
for _ in range(3):
    out = it(runner)
jax.block_until_ready(jax.tree.leaves(out))
dt = (time.perf_counter() - t0) / 3
emit({"stage": "A", "num_envs": 4096, "ms_per_iter": round(dt * 1e3, 1),
      "env_steps_per_s": round(4096 * 128 / dt)})
del ppo, runner, it, out

# ---- stage B ----------------------------------------------------------------
BUDGET = 750_000_000
for tag, cfg in RECIPES.items():
    ppo = PPO(ENV, cfg)
    runner = ppo.init(jax.random.PRNGKey(0))
    it = jax.jit(ppo.train_iteration)
    per_update = cfg.batch_size
    updates = BUDGET // per_update
    rows = []
    t0 = time.time()
    for u in range(1, updates + 1):
        runner, m = it(runner)
        if u % 50 == 0 or u == updates:
            le = landing_eval(
                ppo, runner.params,
                jax.random.fold_in(jax.random.PRNGKey(11), u), 64,
            )
            row = {"update": u, "env_steps": u * per_update,
                   "steps_per_s": round(u * per_update / (time.time() - t0)),
                   "mean_reward": float(m["mean_reward"]),
                   "entropy": float(m["entropy"]), **le}
            rows.append(row)
            print(tag, json.dumps({k: (round(v, 3) if isinstance(v, float)
                                       else v) for k, v in row.items()}),
                  flush=True)
    final = landing_eval(ppo, runner.params, jax.random.PRNGKey(999), 256)
    emit({"stage": "B", "recipe": tag,
          "config": {"lr": cfg.learning_rate, "clip": cfg.clip_eps,
                     "init_log_std": cfg.init_log_std},
          "train_wall_s": round(time.time() - t0),
          "final_eval_256": final,
          "best_soft_rate": max((r["soft_rate"] for r in rows), default=0),
          "best_complete_rate": max((r["complete_rate"] for r in rows),
                                    default=0),
          "rows": rows})
    del ppo, runner, it
print("done", round(time.time() - T0), "s", flush=True)
