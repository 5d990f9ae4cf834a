"""Round-4 PPO >=20M part C: the solve-recipe (3ep x 128mb) + bf16 compute.

Part B found the solving fast recipe: 8192 envs, 3 epochs x 128 minibatches,
lr 2e-4 (mode-9 solve at 0.92B steps, seed 0) — but at 14.6M env-steps/s
with an accidental rollout regression (since reverted: the post-scan
bootstrap hoist cost +9ms). The remaining SGD phase (~37 ms) is BANDWIDTH-
bound on f32 activations (per-minibatch time halves when the minibatch
halves), so compute_dtype=bfloat16 — whose curve equivalence the round-3
ppo_bf16_curves_tpu.jsonl already established, and which round 3 measured
as useless only at latency-bound batch sizes — should cut it roughly in
half here.

Stage A: timings for (8192, 3ep, 128mb) f32 vs bf16 (reverted rollout).
Stage B: 2-seed mode-9 solve curves at bf16 (bar: eval >= 24000).

Run (holds the TPU):
    timeout 7200 python docs/artifacts/ppo_20m_r4c.py
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

OUT = f"{ART}/ppo_20m_r4c_tpu.jsonl"
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


def recipe(dtype, lr=2e-4):
    return PPOConfig(
        num_envs=8192, rollout_steps=128, num_epochs=3, num_minibatches=128,
        learning_rate=lr, clip_eps=0.1, init_log_std=-1.6,
        compute_dtype=dtype,
    )


# ---- stage A ----------------------------------------------------------------
for dtype in ("float32", "bfloat16"):
    cfg = recipe(dtype)
    try:
        ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
        runner = ppo.init(jax.random.PRNGKey(0))
        it = jax.jit(ppo.train_iteration)
        dt = timeit(it, runner)
        dt_roll = timeit(jax.jit(ppo._rollout), runner)
        del runner
        emit({"stage": "A", "dtype": dtype, "num_envs": 8192,
              "epochs": 3, "minibatches": 128,
              "ms_per_iter": round(dt * 1e3, 2),
              "ms_rollout": round(dt_roll * 1e3, 2),
              "ms_sgd_phase": round((dt - dt_roll) * 1e3, 2),
              "env_steps_per_s": round(cfg.batch_size / dt)})
    except Exception as e:
        emit({"stage": "A", "dtype": dtype, "error": repr(e)[:300]})

# ---- stage B: 2-seed solve curves at bf16 -----------------------------------
BAR = 24_000.0
for seed in (0, 1):
    cfg = recipe("bfloat16")
    ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
    rows = []

    def on_metrics(u, row):
        rows.append(row)
        print(f"s{seed}", json.dumps(
            {k: round(v, 1) for k, v in row.items()
             if k in ("update", "env_steps", "steps_per_s",
                      "eval_mean_reward", "eval_mean_length")}), flush=True)

    t0 = time.time()
    train(ppo, TrainConfig(
        total_timesteps=3_000_000_000, eval_every_updates=40,
        eval_episodes=16, seed=seed,
    ), on_metrics=on_metrics)
    solved = [r for r in rows if r["eval_mean_reward"] >= BAR]
    emit({"stage": "B", "seed": seed,
          "recipe": {"num_envs": 8192, "epochs": 3, "minibatches": 128,
                     "lr": 2e-4, "compute_dtype": "bfloat16",
                     "net": "(256,256) hovering arch"},
          "train_wall_s": round(time.time() - t0),
          "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
          "solved_at_env_steps": solved[0]["env_steps"] if solved else None,
          "best_eval": max((r["eval_mean_reward"] for r in rows),
                           default=None),
          "rows": rows[::4] + rows[-1:]})

print("PPO-20M-C DONE in", round(time.time() - T0), "s", flush=True)
