"""Round-4 PPO fast-recipe selection + curve evidence (VERDICT item 1).

Probe 1 (ppo_scale_probe_r4_tpu.jsonl) showed:
  - epochs is the big lever: 8192 envs / 3 epochs -> 17.2M env-steps/s
  - the XLA SGD epoch degrades superlinearly with batch (10.7 -> 28
    ns/sample/epoch from 8K to 64K envs) while the fused-SGD kernel stays
    flat (~12.6 ns) -- at 32K+ envs the kernel is ~2x the XLA epoch
  - the packed rollout recomputes a full vmapped reset EVERY step
    (25 of the 61 ms iteration at 8192/3)

Stage A here measures the cached-reset packed rollout (refresh=64, the
established opt-in mechanism) x low-epoch configs to pick the >=20M recipe.
Stage B runs 2-seed mode-9 mod-hovering training curves with the chosen
recipe -- the curve-equivalence evidence (shuffle-fix methodology,
ppo_shuffle_fix_tpu.jsonl): both seeds must cross the mode-9 transition
(eval >= 30/35 per step avg -> ~24000 episode reward at 800-step episodes)
within the 3B-step budget, like the 10-epoch recipe does at 0.26-0.73B.

Run (holds the TPU):
    timeout 7200 python docs/artifacts/ppo_fast_recipe_r4.py
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

OUT = f"{ART}/ppo_fast_recipe_r4_tpu.jsonl"
open(OUT, "w").close()


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


def timeit(fn, *args, reps=3, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.perf_counter() - t0) / reps


ENV_KW = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)


def recipe(num_envs, epochs, lr=1e-4, **kw):
    return PPOConfig(
        num_envs=num_envs, rollout_steps=128, num_epochs=epochs,
        num_minibatches=64, learning_rate=lr, clip_eps=0.1,
        init_log_std=-1.6, cached_reset_refresh=64, **kw,
    )


# ---- stage A: measure cached-rollout configs -------------------------------
for num_envs, epochs, fused in (
    (8192, 10, False),
    (8192, 3, False),
    (8192, 2, False),
    (8192, 3, True),
    (16384, 3, False),
    (32768, 3, True),
):
    cfg = recipe(num_envs, epochs, fused_sgd=fused)
    try:
        ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
        runner = ppo.init(jax.random.PRNGKey(0))
        it = jax.jit(ppo.train_iteration)
        dt = timeit(it, runner)
        dt_roll = timeit(jax.jit(ppo._rollout), runner)
        del runner
        emit({"stage": "A", "num_envs": num_envs, "epochs": epochs,
              "fused_sgd": fused, "rollout": "packed+cached64",
              "ms_per_iter": round(dt * 1e3, 2),
              "ms_rollout": round(dt_roll * 1e3, 2),
              "env_steps_per_s": round(cfg.batch_size / dt)})
    except Exception as e:
        emit({"stage": "A", "num_envs": num_envs, "epochs": epochs,
              "fused_sgd": fused, "error": repr(e)[:300]})

# ---- stage B: 2-seed curves for the candidate recipes ----------------------
# success bar: eval_mean_reward >= 24000 (30/35 per step over full episodes)
BAR = 24_000.0
for lr in (1e-4, 2e-4):
    for seed in (0, 1):
        cfg = recipe(8192, 3, lr=lr)
        ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
        rows = []

        def on_metrics(u, row):
            rows.append(row)
            print(f"lr{lr}-s{seed}",
                  json.dumps({k: round(v, 1) for k, v in row.items()
                              if k in ("update", "env_steps", "steps_per_s",
                                       "eval_mean_reward",
                                       "eval_mean_length")}),
                  flush=True)

        t0 = time.time()
        train(ppo, TrainConfig(
            total_timesteps=3_000_000_000, eval_every_updates=40,
            eval_episodes=16, seed=seed,
        ), on_metrics=on_metrics)
        solved = [r for r in rows if r["eval_mean_reward"] >= BAR]
        emit({"stage": "B", "recipe": {"num_envs": 8192, "epochs": 3,
                                       "minibatches": 64, "lr": lr,
                                       "rollout": "packed+cached64"},
              "seed": seed, "train_wall_s": round(time.time() - t0),
              "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
              "solved_at_env_steps": solved[0]["env_steps"] if solved else None,
              "best_eval": max((r["eval_mean_reward"] for r in rows),
                               default=None),
              "rows": rows[::4] + rows[-1:]})

print("FAST-RECIPE DONE in", round(time.time() - T0), "s", flush=True)
