"""Round-4 PPO >=20M part F: scale the BATCH, keep the solve recipe's math.

Part E killed the epochs knob as tried: 2ep x 128mb fused curves fail
outright (best eval -26K, seed 0, both lr 2e-4 and 3e-4) — and it left an
open question whether the fused kernel path itself hurts long trainings
(round 3 only ever checked 2-iteration param drift).

The phase model from parts B/C/D: env-steps/s = 1/(1/R_roll + e/R_sgd)
with R_sgd ~= 90M row-updates/s (both learner implementations) and R_roll
RISING with batch (41M @ 8192 -> ~70M @ 65536, ppo_20m_r4b stage A2
rollout columns). So batch scaling with the minibatch SIZE held at the
proven 8192 (num_minibatches scales with the batch), same lr/epochs/clip,
projects ~20.5M at 65536 envs. The only semantic delta vs the solved
3ep x 128mb recipe is more minibatch updates per (bigger) on-policy batch
— same rows-per-datum, same update granularity.

  A — XLA f32 timings: (32768, 3ep, 512mb) and (65536, 3ep, 1024mb).
  B — 2-seed mode-9 solve curves (bar eval >= 24000, 3B budget) on the
      fastest stage-A config that clears ~19.5M.
  C — diagnostics at 8192: (c1) 2ep x 128 XLA curve (was part E's failure
      the recipe or the fused path?); (c2) 3ep x 128 fused1024 curve (does
      the fused kernel train healthily over a full run?).

Run (holds the TPU):
    timeout 7200 python docs/artifacts/ppo_20m_r4f.py
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

OUT = f"{ART}/ppo_20m_r4f_tpu.jsonl"
open(OUT, "w").close()

ENV_KW = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)
BAR = 24_000.0


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


def curve(tag, cfg, seed, budget=3_000_000_000):
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
        total_timesteps=budget, eval_every_updates=max(
            1, 40 * 8192 // cfg.num_envs),
        eval_episodes=16, seed=seed,
    ), on_metrics=on_metrics)
    solved = [r for r in rows if r["eval_mean_reward"] >= BAR]
    emit({"stage": tag, "seed": seed,
          "recipe": {"num_envs": cfg.num_envs, "epochs": cfg.num_epochs,
                     "minibatches": cfg.num_minibatches,
                     "lr": cfg.learning_rate, "fused_sgd": cfg.fused_sgd},
          "train_wall_s": round(time.time() - t0),
          "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
          "solved_at_env_steps": solved[0]["env_steps"] if solved else None,
          "best_eval": max((r["eval_mean_reward"] for r in rows),
                           default=None),
          "rows": rows[::4] + rows[-1:]})
    return bool(solved)


# ---- stage A: batch scaling at fixed minibatch 8192 -------------------------
best_cfg, best_sps = None, 0.0
for num_envs, mbs in ((32768, 512), (65536, 1024)):
    cfg = PPOConfig(num_envs=num_envs, rollout_steps=128, num_epochs=3,
                    num_minibatches=mbs, learning_rate=2e-4, clip_eps=0.1,
                    init_log_std=-1.6)
    try:
        ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
        runner = ppo.init(jax.random.PRNGKey(0))
        it = jax.jit(ppo.train_iteration)
        dt = timeit(it, runner)
        dt_roll = timeit(jax.jit(ppo._rollout), runner)
        del runner, ppo
        sps = cfg.batch_size / dt
        if sps > best_sps:
            best_cfg, best_sps = cfg, sps
        emit({"stage": "A", "num_envs": num_envs, "minibatches": mbs,
              "ms_per_iter": round(dt * 1e3, 2),
              "ms_rollout": round(dt_roll * 1e3, 2),
              "ms_sgd_phase": round((dt - dt_roll) * 1e3, 2),
              "env_steps_per_s": round(sps)})
    except Exception as e:
        emit({"stage": "A", "num_envs": num_envs, "error": repr(e)[:300]})

# ---- stage B: solve curves on the winner ------------------------------------
if best_cfg is not None and best_sps >= 19.5e6:
    for seed in (0, 1):
        curve("B", best_cfg, seed)
else:
    emit({"stage": "B", "skipped": True, "best_sps": best_sps})

# ---- stage C: diagnostics at 8192 -------------------------------------------
curve("C1-2ep-xla", PPOConfig(
    num_envs=8192, rollout_steps=128, num_epochs=2, num_minibatches=128,
    learning_rate=2e-4, clip_eps=0.1, init_log_std=-1.6), seed=0)
curve("C2-3ep-fused", PPOConfig(
    num_envs=8192, rollout_steps=128, num_epochs=3, num_minibatches=128,
    learning_rate=2e-4, clip_eps=0.1, init_log_std=-1.6,
    fused_sgd=True, fused_sgd_chunk=1024), seed=0)

print("PPO-20M-F DONE in", round(time.time() - T0), "s", flush=True)
