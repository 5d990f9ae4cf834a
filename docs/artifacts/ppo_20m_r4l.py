"""Round-4 PPO >=20M part L: device-resident timing + the 64K solve curves.

Part K's A/B was null (the aligned gather changes nothing — XLA fuses the
epoch gather into the minibatch reads, so probe I's standalone 41.65 ms
never happens inside the real program) and exposed ±20% process-to-process
variance at identical code (8192-env iteration: 64.9 ms in probe C, 68.8
in H, 80.4 in K): per-call tunnel round-trips pollute single-iteration
timings. This probe measures what the chip actually sustains: N=4
train iterations CHAINED in one jitted lax.scan (no host round-trip
between updates — how device-resident training runs), reps=5.

  A — chained-iteration timings: (8192, 3ep, 128mb), (65536, 3ep, 512mb).
  B — 2-seed solve curves at (65536, 3ep, 512mb) lr 2e-4 (bar eval >=
      24000, 4B budget, per-seed 1e-4 fallback) — the curve evidence for
      the headline config, run regardless of stage A.

Run (holds the TPU):
    timeout 10800 python docs/artifacts/ppo_20m_r4l.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ART = "/root/repo/docs/artifacts"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

from pyflyt_tpu.envs.quadx_mod.packed_hovering import (  # noqa: E402
    PackedQuadXModHoveringEnv,
)
from pyflyt_tpu.rl import PPO, PPOConfig, TrainConfig, train  # noqa: E402

OUT = f"{ART}/ppo_20m_r4l_tpu.jsonl"
open(OUT, "w").close()

ENV_KW = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)
BAR = 24_000.0
CHAIN = 4


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


def mk(num_envs, mbs, lr=2e-4):
    return PPOConfig(num_envs=num_envs, rollout_steps=128, num_epochs=3,
                     num_minibatches=mbs, learning_rate=lr, clip_eps=0.1,
                     init_log_std=-1.6)


# ---- stage A: chained timings ----------------------------------------------
for num_envs, mbs in ((8192, 128), (65536, 512)):
    cfg = mk(num_envs, mbs)
    ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
    runner = ppo.init(jax.random.PRNGKey(0))

    @jax.jit
    def chain(r):
        def body(rr, _):
            rr, _m = ppo.train_iteration(rr)
            return rr, ()
        r, _ = jax.lax.scan(body, r, None, length=CHAIN)
        return r

    out = chain(runner)
    jax.block_until_ready(jax.tree.leaves(out.params))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = chain(runner)
        jax.block_until_ready(jax.tree.leaves(out.params))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med, lo = ts[len(ts) // 2], ts[0]
    del runner, ppo, out
    emit({"stage": "A", "num_envs": num_envs, "minibatches": mbs,
          "chain": CHAIN,
          "ms_per_iter_median": round(med / CHAIN * 1e3, 2),
          "ms_per_iter_best": round(lo / CHAIN * 1e3, 2),
          "env_steps_per_s_median": round(cfg.batch_size * CHAIN / med),
          "env_steps_per_s_best": round(cfg.batch_size * CHAIN / lo)})


# ---- stage B: the 64K solve curves ------------------------------------------
def curve(tag, cfg, seed, budget=4_000_000_000):
    ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
    rows = []

    def on_metrics(u, row):
        rows.append(row)
        print(tag, json.dumps(
            {k: round(v, 1) for k, v in row.items()
             if k in ("update", "env_steps", "steps_per_s",
                      "eval_mean_reward", "eval_mean_length")}), flush=True)

    t0 = time.time()
    train(ppo, TrainConfig(
        total_timesteps=budget,
        eval_every_updates=max(1, 40 * 8192 // cfg.num_envs),
        eval_episodes=16, seed=seed,
    ), on_metrics=on_metrics)
    solved = [r for r in rows if r["eval_mean_reward"] >= BAR]
    emit({"stage": tag, "seed": seed,
          "recipe": {"num_envs": cfg.num_envs, "epochs": cfg.num_epochs,
                     "minibatches": cfg.num_minibatches,
                     "lr": cfg.learning_rate},
          "train_wall_s": round(time.time() - t0),
          "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
          "solved_at_env_steps": solved[0]["env_steps"] if solved else None,
          "best_eval": max((r["eval_mean_reward"] for r in rows),
                           default=None),
          "rows": rows[::4] + rows[-1:]})
    return bool(solved)


for seed in (0, 1):
    if not curve("B", mk(65536, 512), seed):
        curve("B", mk(65536, 512, lr=1e-4), seed)

print("PPO-20M-L DONE in", round(time.time() - T0), "s", flush=True)
