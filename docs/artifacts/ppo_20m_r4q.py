"""Round-4 fused-SGD health part Q: base rate vs backward-matmul noise.

Probe O's tally (with r4f C2 and r4b): at the 8192-env 3ep x 128mb lr 2e-4
recipe, XLA solved 2/2 (seeds 0,1) while the fused kernel solved 1/5
(C2 s0 fail; O: consistent-logp ON s0/s1/s2 fail — best 19.5K on s1 — and
OFF s1 solve). Probe N showed the two paths' FORWARDS are bit-identical
on chip and per-update divergence is zero-mean ~0.5-1% of the update norm
— which localizes the only remaining arithmetic difference to the
BACKWARD matmuls: the kernel casts every dgrad/wgrad input to bf16, while
XLA autodiff plausibly computes the degenerate small-K dgrads (K=1 value
head, K=4 pi head) as f32 VPU outer-products. Two competing explanations
for the solve-rate gap:

  (1) the recipe's breakout is knife-edge and XLA's 2/2 was lucky —
      i.e. the base rate is well under 1;
  (2) the kernel's extra bf16 backward noise floor genuinely suppresses
      the breakout.

  X — XLA path, FRESH seeds 2,3,4: the base solve rate answer.
  K — fused (consistent ON) with f32 BACKWARD matmuls (_mm_tn/_mm_nt
      monkeypatched; forward stays bf16 = bit-identical to XLA), seeds
      0,2: if these solve where O's bf16-backward failed, (2) is the
      story and an f32-dgrad training-grade kernel mode is the fix.

POST-HOC NOTE (result): arm X went 1/3 — seeds 3,4 fail with EXACTLY the
C2 signature (entropy climbing to +1.4/+1.6, reward plateau ~-85) in the
pure XLA path, so the failure mode is recipe-inherent and the fused-vs-XLA
tallies (1/6 vs 3/5, Fisher p~0.24) establish no kernel pathology. Arm K
turned out to be a NO-OP on the MXU: a f32 `dot_general` under DEFAULT
precision truncates inputs to bf16 exactly like the explicit cast
(`precision=HIGHEST` would be needed), and both arm-K runs reproduced
probe r4o's ON-arm runs BIT-IDENTICALLY from independent processes —
which is itself the round's determinism evidence.

Run (holds the TPU):
    timeout 7200 python docs/artifacts/ppo_20m_r4q.py
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
from pyflyt_tpu.ops import pallas_sgd  # noqa: E402
from pyflyt_tpu.rl import PPO, PPOConfig, TrainConfig, train  # noqa: E402

OUT = f"{ART}/ppo_20m_r4q_tpu.jsonl"
open(OUT, "w").close()

ENV_KW = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)
BAR = 24_000.0


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


def curve(tag, cfg, seed, budget=3_000_000_000):
    ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
    rows = []

    def on_metrics(u, row):
        rows.append(row)
        if len(rows) % 8 == 1:
            print(tag, json.dumps(
                {k: round(v, 1) for k, v in row.items()
                 if k in ("update", "env_steps", "entropy", "mean_reward",
                          "eval_mean_reward")}), flush=True)

    t0 = time.time()
    train(ppo, TrainConfig(
        total_timesteps=budget, eval_every_updates=40,
        eval_episodes=16, seed=seed,
    ), on_metrics=on_metrics)
    solved = [r for r in rows if r["eval_mean_reward"] >= BAR]
    emit({"stage": tag, "seed": seed,
          "train_wall_s": round(time.time() - t0),
          "solved_at_env_steps": solved[0]["env_steps"] if solved else None,
          "best_eval": max((r["eval_mean_reward"] for r in rows),
                           default=None),
          "final_entropy": rows[-1]["entropy"] if rows else None,
          "rows": rows[::8] + rows[-1:]})
    return bool(solved)


CFG_X = PPOConfig(num_envs=8192, rollout_steps=128, num_epochs=3,
                  num_minibatches=128, learning_rate=2e-4, clip_eps=0.1,
                  init_log_std=-1.6)

# ---- arm X: XLA base rate, fresh seeds --------------------------------------
nx = sum(curve("X", CFG_X, seed) for seed in (2, 3, 4))
emit({"stage": "X-tally", "solved": nx, "of": 3,
      "with_r4b": f"{nx + 2}/5 across seeds 0-4"})

# ---- arm K: fused with f32 backward matmuls ---------------------------------
def mm32_tn(a, b):
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def mm32_nt(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


pallas_sgd._mm_tn = mm32_tn
pallas_sgd._mm_nt = mm32_nt

import dataclasses  # noqa: E402

CFG_K = dataclasses.replace(CFG_X, fused_sgd=True)
nk = sum(curve("K-f32bwd", CFG_K, seed) for seed in (0, 2))
emit({"stage": "verdict", "xla_fresh": f"{nx}/3",
      "fused_f32bwd": f"{nk}/2",
      "fused_bf16bwd_prior": "1/5 (C2 + probe O)"})
print("done", round(time.time() - T0), "s", flush=True)
