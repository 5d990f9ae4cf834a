"""Round-4 PPO >=20M part K: lane-aligned shuffle A/B inside the real
train iteration, one process, interleaved — then the solve curves.

Part J diagnosed the epoch shuffle at 38-46 GB/s (feat=23-float minor dim
= 18% vreg occupancy); rl/ppo.py::_shuffle_gather now gathers on a
(num_blocks, blk*feat/128, 128) bit-exact view whenever a block is a
whole number of vregs. Standalone micro-timings went untrustworthy when
the tunnel got flaky (0.1 ms "copies"), so this probe measures what
matters: the full jitted train_iteration, BOTH formulations compiled in
ONE process and timed interleaved.

  A — (65536, 3ep, 512mb): iteration ms, old vs aligned, 5 reps each
      interleaved; same for (8192, 3ep, 128mb).
  B — if aligned >= 20M at 64K: 2-seed solve curves (bar eval >= 24000,
      4B budget, lr 2e-4, per-seed 1e-4 fallback).

Run (holds the TPU):
    timeout 10800 python docs/artifacts/ppo_20m_r4k.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

ART = "/root/repo/docs/artifacts"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

import pyflyt_tpu.rl.ppo as ppo_mod  # noqa: E402
from pyflyt_tpu.envs.quadx_mod.packed_hovering import (  # noqa: E402
    PackedQuadXModHoveringEnv,
)
from pyflyt_tpu.rl import PPO, PPOConfig, TrainConfig, train  # noqa: E402

OUT = f"{ART}/ppo_20m_r4k_tpu.jsonl"
open(OUT, "w").close()

ENV_KW = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)
BAR = 24_000.0


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


def old_gather(packed, perm, num_blocks, blk, feat, num_minibatches,
               minibatch_size):
    return packed.reshape((num_blocks, blk, feat))[perm].reshape(
        (num_minibatches, minibatch_size, feat))


new_gather = ppo_mod._shuffle_gather


def mk(num_envs, mbs, lr=2e-4):
    return PPOConfig(num_envs=num_envs, rollout_steps=128, num_epochs=3,
                     num_minibatches=mbs, learning_rate=lr, clip_eps=0.1,
                     init_log_std=-1.6)


# ---- stage A: interleaved A/B ----------------------------------------------
best64 = 0.0
for num_envs, mbs in ((65536, 512), (8192, 128)):
    cfg = mk(num_envs, mbs)
    ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
    runner = ppo.init(jax.random.PRNGKey(0))
    fns = {}
    for name, g in (("old", old_gather), ("aligned", new_gather)):
        ppo_mod._shuffle_gather = g
        fns[name] = jax.jit(ppo.train_iteration)
        out = fns[name](runner)  # compile under this formulation
        jax.block_until_ready(jax.tree.leaves(out[0].params))
    ppo_mod._shuffle_gather = new_gather
    times = {"old": [], "aligned": []}
    for _ in range(5):
        for name in ("old", "aligned"):
            t0 = time.perf_counter()
            out = fns[name](runner)
            jax.block_until_ready(jax.tree.leaves(out[0].params))
            times[name].append(time.perf_counter() - t0)
    del runner, ppo
    row = {"stage": "A", "num_envs": num_envs, "minibatches": mbs}
    for name, ts in times.items():
        ts.sort()
        med = ts[len(ts) // 2]
        row[f"ms_{name}"] = round(med * 1e3, 2)
        row[f"sps_{name}"] = round(cfg.batch_size / med)
    emit(row)
    if num_envs == 65536:
        best64 = row["sps_aligned"]

# ---- stage B: solve curves at the 64K recipe --------------------------------
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


if best64 >= 20e6:
    for seed in (0, 1):
        if not curve("B", mk(65536, 512), seed):
            curve("B", mk(65536, 512, lr=1e-4), seed)
else:
    emit({"stage": "B", "skipped": True, "best64": best64})

print("PPO-20M-K DONE in", round(time.time() - T0), "s", flush=True)
