"""Round-4 PPO >=20M part H: the slot-bootstrap rollout closes the gap.

Part G peaked at 19.79M (65536 envs, 3ep x 512mb, minibatch 16384): the
SGD phase is pinned at ~81M row-updates/s (minibatch-16384 optimum) and
the rollout carried a redundant per-step vf apply on the whole batch for
the time-limit bootstrap. PPOConfig.slot_bootstrap (rl/ppo.py) now defers
that to ONE post-scan vf apply on a per-env slot (~1/3 of rollout network
flops removed; parity test in tests/test_ppo.py).

  A — iteration timings with the slot rollout:
      (8192, 128mb), (32768, 256mb), (65536, 512mb) — all 3ep, f32, XLA.
  B — 2-seed mode-9 solve curves (bar eval >= 24000, 4B budget) on the
      fastest stage-A config >= 20M, lr 2e-4 with per-seed 1e-4 fallback —
      the curve evidence for the headline number.

Run (holds the TPU):
    timeout 10800 python docs/artifacts/ppo_20m_r4h.py
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

OUT = f"{ART}/ppo_20m_r4h_tpu.jsonl"
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


def mk(num_envs, mbs, lr=2e-4):
    return PPOConfig(num_envs=num_envs, rollout_steps=128, num_epochs=3,
                     num_minibatches=mbs, learning_rate=lr, clip_eps=0.1,
                     init_log_std=-1.6)


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


# ---- stage A ----------------------------------------------------------------
best_cfg, best_sps = None, 0.0
for num_envs, mbs in ((8192, 128), (32768, 256), (65536, 512)):
    cfg = mk(num_envs, mbs)
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
        emit({"stage": "A", "num_envs": num_envs, "minibatches": mbs,
              "error": repr(e)[:300]})

# ---- stage B ----------------------------------------------------------------
if best_cfg is not None and best_sps >= 20e6:
    for seed in (0, 1):
        if not curve("B", best_cfg, seed):
            curve("B", mk(best_cfg.num_envs, best_cfg.num_minibatches,
                          lr=1e-4), seed)
else:
    emit({"stage": "B", "skipped": True, "best_sps": best_sps})

print("PPO-20M-H DONE in", round(time.time() - T0), "s", flush=True)
