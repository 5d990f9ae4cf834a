"""Round-4 PPO >=20M part M: solve curves for the 32768-env config.

Part L: 64K x 512mb sustains 19.57M device-resident but FAILS its solve
curves (lr 2e-4 best -14K; lr 1e-4 best 22.97K in 4B) — 1536 sequential
minibatch updates per on-policy batch is too stale. 32768 x 256mb keeps
minibatch 16384 and halves the staleness (768 updates/batch) at a
measured 19.3-19.4M. This probe settles whether the ~19.5M engine tier
has an honestly-solving recipe, or whether the curve-backed headline
stays with the 8192-env recipe (14.9-16.1M, r4b curves).

  A — chained (4x) device-resident timing at (32768, 3ep, 256mb).
  B — solve curves: 2 seeds, lr 2e-4 with per-seed 1e-4 fallback,
      4B budget, bar eval >= 24000.

Run (holds the TPU):
    timeout 10800 python docs/artifacts/ppo_20m_r4m.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

ART = "/root/repo/docs/artifacts"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

from pyflyt_tpu.envs.quadx_mod.packed_hovering import (  # noqa: E402
    PackedQuadXModHoveringEnv,
)
from pyflyt_tpu.rl import PPO, PPOConfig, TrainConfig, train  # noqa: E402

OUT = f"{ART}/ppo_20m_r4m_tpu.jsonl"
open(OUT, "w").close()

ENV_KW = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)
BAR = 24_000.0


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


def mk(lr=2e-4):
    return PPOConfig(num_envs=32768, rollout_steps=128, num_epochs=3,
                     num_minibatches=256, learning_rate=lr, clip_eps=0.1,
                     init_log_std=-1.6)


# ---- stage A ----------------------------------------------------------------
cfg = mk()
ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
runner = ppo.init(jax.random.PRNGKey(0))


@jax.jit
def chain(r):
    def body(rr, _):
        rr, _m = ppo.train_iteration(rr)
        return rr, ()
    return jax.lax.scan(body, r, None, length=4)[0]


out = chain(runner)
jax.block_until_ready(jax.tree.leaves(out.params))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out = chain(runner)
    jax.block_until_ready(jax.tree.leaves(out.params))
    ts.append(time.perf_counter() - t0)
ts.sort()
med = ts[len(ts) // 2]
del runner, ppo, out
emit({"stage": "A", "num_envs": 32768, "minibatches": 256, "chain": 4,
      "ms_per_iter_median": round(med / 4 * 1e3, 2),
      "env_steps_per_s_median": round(cfg.batch_size * 4 / med),
      "env_steps_per_s_best": round(cfg.batch_size * 4 / ts[0])})


# ---- stage B ----------------------------------------------------------------
def curve(cfg, seed, budget=4_000_000_000):
    ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
    rows = []

    def on_metrics(u, row):
        rows.append(row)
        print(f"s{seed}-lr{cfg.learning_rate}", json.dumps(
            {k: round(v, 1) for k, v in row.items()
             if k in ("update", "env_steps", "steps_per_s",
                      "eval_mean_reward", "eval_mean_length")}), flush=True)

    t0 = time.time()
    train(ppo, TrainConfig(
        total_timesteps=budget, eval_every_updates=10,
        eval_episodes=16, seed=seed,
    ), on_metrics=on_metrics)
    solved = [r for r in rows if r["eval_mean_reward"] >= BAR]
    emit({"stage": "B", "seed": seed,
          "recipe": {"num_envs": 32768, "epochs": 3, "minibatches": 256,
                     "lr": cfg.learning_rate},
          "train_wall_s": round(time.time() - t0),
          "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
          "solved_at_env_steps": solved[0]["env_steps"] if solved else None,
          "best_eval": max((r["eval_mean_reward"] for r in rows),
                           default=None),
          "rows": rows[::4] + rows[-1:]})
    return bool(solved)


for seed in (0, 1):
    if not curve(mk(), seed):
        curve(mk(lr=1e-4), seed)

print("PPO-20M-M DONE in", round(time.time() - T0), "s", flush=True)
