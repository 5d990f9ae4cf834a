"""Round-4 PPO >=20M part P: the fused ROLLOUT forward on the 32K config.

The r4m curve-backed headline is 19.35M env-steps/s at (32768 envs,
3ep x 256mb, lr 2e-4) with the XLA epoch — ~55 ms of the ~217 ms
iteration is rollout, and most of the rollout's non-env-kernel time is
the policy forward's (B, 256) trunk-activation HBM round-trips. The
fused policy/value forward (ops/pallas_policy.py) keeps weights and
activations VMEM-resident and — per probe r4n — computes the SAME bits
as the XLA forward on v5e, so composing it with the exact XLA SGD epoch
changes throughput, not training semantics. The fused SGD kernel is NOT
part of this config: probe O/Q measured its solve-rate deficit (1/6 vs
XLA 2/2 at the 8192 recipe).

  A1 — chained (4x) device-resident timing: fused_rollout_forward +
       XLA epochs, f32.
  A2 — same with fused_sgd too (throughput reference only).
  B  — 2-seed mode-9 solve curves (bar eval >= 24000, 4B budget) at A1.

Run (holds the TPU):
    timeout 9000 python docs/artifacts/ppo_20m_r4p.py
"""

import dataclasses
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

OUT = f"{ART}/ppo_20m_r4p_tpu.jsonl"
open(OUT, "w").close()

ENV_KW = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)
BAR = 24_000.0


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


CFG = PPOConfig(num_envs=32768, rollout_steps=128, num_epochs=3,
                num_minibatches=256, learning_rate=2e-4, clip_eps=0.1,
                init_log_std=-1.6, fused_rollout_forward=True)


def time_chained(stage, cfg):
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
    sps = round(cfg.batch_size * 4 / med)
    emit({"stage": stage, "num_envs": 32768, "minibatches": 256, "chain": 4,
          "fused_rollout_forward": cfg.fused_rollout_forward,
          "fused_sgd": cfg.fused_sgd,
          "ms_per_iter_median": round(med / 4 * 1e3, 2),
          "env_steps_per_s_median": sps,
          "env_steps_per_s_best": round(cfg.batch_size * 4 / ts[0])})
    return sps


time_chained("A1", CFG)
time_chained("A2", dataclasses.replace(CFG, fused_sgd=True))


# ---- stage B: 2-seed solve curves at A1 -------------------------------------
def curve(seed, budget=4_000_000_000):
    ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), CFG)
    rows = []

    def on_metrics(u, row):
        rows.append(row)
        if len(rows) % 4 == 1:
            print(f"s{seed}", json.dumps(
                {k: round(v, 1) for k, v in row.items()
                 if k in ("update", "env_steps", "steps_per_s", "entropy",
                          "eval_mean_reward", "eval_mean_length")}),
                flush=True)

    t0 = time.time()
    train(ppo, TrainConfig(
        total_timesteps=budget, eval_every_updates=10,
        eval_episodes=16, seed=seed,
    ), on_metrics=on_metrics)
    solved = [r for r in rows if r["eval_mean_reward"] >= BAR]
    emit({"stage": "B", "seed": seed,
          "recipe": {"num_envs": 32768, "epochs": 3, "minibatches": 256,
                     "lr": CFG.learning_rate,
                     "fused_rollout_forward": True, "sgd": "xla"},
          "train_wall_s": round(time.time() - t0),
          "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
          "solved_at_env_steps": solved[0]["env_steps"] if solved else None,
          "best_eval": max((r["eval_mean_reward"] for r in rows),
                           default=None),
          "rows": rows[::4] + rows[-1:]})
    return bool(solved)


n = sum(curve(seed) for seed in (0, 1))
emit({"stage": "verdict", "solved": n, "of": 2})
print("done", round(time.time() - T0), "s", flush=True)
