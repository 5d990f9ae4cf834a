"""Round-4 PPO >=20M part P: the fused kernel on the 32K solve config.

Contingent on probe O downgrading the fused-SGD health caution (seed
variance, not a Mosaic pathology). The r4m curve-backed headline is
19.35M env-steps/s at (32768 envs, 3ep x 256mb, lr 2e-4) with the XLA
epoch; probe D measured the fused epoch kernel +4% at the 8192 solve
recipe. If that margin holds at 32K the fused path crosses the 20M bar
VERDICT round 3 set — with solve curves, not just throughput.

  A  — chained (4x) device-resident timing at (32768, 3ep x 256mb,
       fused_sgd + consistent_logp).
  A2 — same + compute_dtype=bfloat16. Rationale: at 32K the rollout is
       plausibly HBM-activation-bound (f32 (B,256) trunk activations);
       r4c's "bf16 buys nothing" verdict was measured on the XLA-epoch
       path at 8192 where the SGD phase hides any rollout gain. With
       fused_sgd the XLA loss path never runs, so compute_dtype only
       halves ROLLOUT activation traffic; the kernel's SGD math is
       unchanged (bf16-matmul/f32-elementwise either way) and
       consistent_logp absorbs the rollout-vs-kernel forward delta by
       construction.
  A3 — A + fused_rollout_forward (ops/pallas_policy.py): the rollout's
       policy forward as one VMEM-resident Mosaic kernel — removes the
       (B, 256) trunk-activation HBM round-trips the XLA forward pays
       (the other, bigger half of the same bandwidth story as A2).
  B  — 2-seed mode-9 solve curves (bar eval >= 24000, 4B budget) at the
       fastest of A/A2/A3.

Run (holds the TPU):
    timeout 7200 python docs/artifacts/ppo_20m_r4p.py
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


import dataclasses  # noqa: E402

CFG = PPOConfig(num_envs=32768, rollout_steps=128, num_epochs=3,
                num_minibatches=256, learning_rate=2e-4, clip_eps=0.1,
                init_log_std=-1.6, fused_sgd=True)
CFG_BF16 = dataclasses.replace(CFG, compute_dtype="bfloat16")


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
          "fused_sgd": True, "consistent_logp": True,
          "compute_dtype": cfg.compute_dtype,
          "fused_rollout_forward": cfg.fused_rollout_forward,
          "ms_per_iter_median": round(med / 4 * 1e3, 2),
          "env_steps_per_s_median": sps,
          "env_steps_per_s_best": round(cfg.batch_size * 4 / ts[0])})
    return sps


CFG_RK = dataclasses.replace(CFG, fused_rollout_forward=True)
results = [(time_chained("A", CFG), CFG),
           (time_chained("A2", CFG_BF16), CFG_BF16),
           (time_chained("A3", CFG_RK), CFG_RK)]
CFG = max(results, key=lambda t: t[0])[1]


# ---- stage B: 2-seed solve curves -------------------------------------------
def curve(seed, budget=4_000_000_000):
    ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), CFG)
    rows = []

    def on_metrics(u, row):
        rows.append(row)
        print(f"s{seed}", json.dumps(
            {k: round(v, 1) for k, v in row.items()
             if k in ("update", "env_steps", "steps_per_s", "entropy",
                      "eval_mean_reward", "eval_mean_length")}), flush=True)

    t0 = time.time()
    train(ppo, TrainConfig(
        total_timesteps=budget, eval_every_updates=10,
        eval_episodes=16, seed=seed,
    ), on_metrics=on_metrics)
    solved = [r for r in rows if r["eval_mean_reward"] >= BAR]
    emit({"stage": "B", "seed": seed,
          "recipe": {"num_envs": 32768, "epochs": 3, "minibatches": 256,
                     "lr": CFG.learning_rate, "fused_sgd": True,
                     "compute_dtype": CFG.compute_dtype,
                     "fused_rollout_forward": CFG.fused_rollout_forward},
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
