"""Round-5 rocket-landing RL on-chip: finish what r4 started (VERDICT #1).

Stage B of docs/artifacts/rocket_rl_r4.py never ran; this executes it with
the round-4 measurement discipline: 2 recipes x 2 seeds x 0.75B env-steps,
landing-tier evals every 50 updates (64 deterministic episodes), a final
256-episode eval of BOTH the final and the best-seen params, and the best
params archived per run (orbax, restore_params-compatible layout).

Landing tiers (rocket_landing.py:141-148, matching the reference's +500
success logic at rocket_landing_env.py:249-258):
  pad      — touched the landing pad at all (+20 path)
  soft     — pad contact below the fatal thresholds (survived touchdown)
  complete — the env's own success flag (stable upright rest, +500)

Run (holds the TPU):
    timeout 10800 python docs/artifacts/rocket_rl_r5.py
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
from pyflyt_tpu.rl import PPO, PPOConfig, checkpoint  # noqa: E402

OUT = f"{ART}/rocket_rl_r5_tpu.jsonl"
open(OUT, "w").close()


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:600], flush=True)


def make_landing_eval(ppo, n):
    env = ppo.env

    @jax.jit
    def run(params, keys):
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

    def landing_eval(params, key):
        keys = jax.random.split(key, n)
        complete, pad, fatal, ep_rew = run(params, keys)
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

    return landing_eval


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
BUDGET = 750_000_000
SEEDS = (0, 1)


def score(le):
    return (le["complete_rate"], le["soft_rate"], le["mean_ep_reward"])


for tag, cfg in RECIPES.items():
    ppo = PPO(ENV, cfg)
    it = jax.jit(ppo.train_iteration)
    eval64 = make_landing_eval(ppo, 64)
    eval256 = make_landing_eval(ppo, 256)
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
                le = eval64(
                    runner.params,
                    jax.random.fold_in(jax.random.PRNGKey(11), u),
                )
                row = {"update": u, "env_steps": u * per_update,
                       "steps_per_s": round(
                           u * per_update / (time.time() - t0)),
                       "mean_reward": float(m["mean_reward"]),
                       "entropy": float(m["entropy"]), **le}
                rows.append(row)
                if best is None or score(le) > best:
                    best = score(le)
                    best_params = jax.tree.map(np.asarray, runner.params)
                print(tag, seed,
                      json.dumps({k: (round(v, 3) if isinstance(v, float)
                                      else v) for k, v in row.items()}),
                      flush=True)
        final = eval256(runner.params, jax.random.PRNGKey(999))
        final_best = eval256(
            jax.tree.map(jnp.asarray, best_params), jax.random.PRNGKey(999)
        )
        ckpt_path = f"{ART}/policies_rocket_r5_{tag}_seed{seed}"
        checkpoint.save(ckpt_path, {"params": best_params})
        emit({"stage": "B", "recipe": tag, "seed": seed,
              "config": {"lr": cfg.learning_rate, "clip": cfg.clip_eps,
                         "init_log_std": cfg.init_log_std},
              "train_wall_s": round(time.time() - t0),
              "final_eval_256": final,
              "best_eval_256": final_best,
              "best_ckpt": ckpt_path,
              "best_soft_rate": max((r["soft_rate"] for r in rows),
                                    default=0),
              "best_complete_rate": max((r["complete_rate"] for r in rows),
                                        default=0),
              "rows": rows})
        del runner
    del ppo, it
print("done", round(time.time() - T0), "s", flush=True)
