"""Round-4 part S: crossing 20M — bf16 rollout vs retuned forward kernel.

Probe R's in-process A/B (spreads ±0.5 ms) settled the rollout story at
32K: XLA iteration 221.3 ms (18.95M env-steps/s), rollout phase 62.2 ms
of it, and the 2048-chunk fused forward a REGRESSION (rollout 99.1 ms —
the 16-step serial matmul+tanh grid loses to XLA's big-M scheduling).
The XLA forward is HBM-activation-bound (~250 us/step moving ~200 MB of
f32 trunk activations), which two cheaper levers attack:

  bf16 — compute_dtype=bfloat16: halves activation bytes in the SAME XLA
         schedule. r4c validated bf16 solve curves at 8192 (and measured
         the SGD phase unchanged); projection here ~206 ms -> ~20.4M.
  rk8  — the fused forward at chunk 8192 (4 grid steps, M=8192 matmuls):
         amortizes the serial chain R flagged.

  A — in-process interleaved chained timings: xla-f32 / xla-bf16 / rk8.
  B — 2-seed solve curves (bar 24K, 4B budget) at the fastest arm if it
      clears 20M (else at xla-bf16 for the curve evidence).

Run (holds the TPU):
    timeout 9000 python docs/artifacts/ppo_20m_r4s.py
"""

import dataclasses
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

OUT = f"{ART}/ppo_20m_r4s_tpu.jsonl"
open(OUT, "w").close()

ENV_KW = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)
BAR = 24_000.0


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


BASE = PPOConfig(num_envs=32768, rollout_steps=128, num_epochs=3,
                 num_minibatches=256, learning_rate=2e-4, clip_eps=0.1,
                 init_log_std=-1.6)
ARMS = {
    "xla-f32": BASE,
    "xla-bf16": dataclasses.replace(BASE, compute_dtype="bfloat16"),
    "rk8": dataclasses.replace(BASE, fused_rollout_forward=True,
                               fused_rollout_chunk=8192),
}

setups = {}
for tag, cfg in ARMS.items():
    ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
    runner = ppo.init(jax.random.PRNGKey(0))

    def mk_chain(p):
        @jax.jit
        def chain(r):
            def body(rr, _):
                rr, _m = p.train_iteration(rr)
                return rr, ()
            return jax.lax.scan(body, r, None, length=4)[0]
        return chain

    def mk_roll(p):
        @jax.jit
        def roll(r):
            def body(rr, _):
                rr, t = p._rollout(rr)
                keep = sum(jnp.sum(x.astype(jnp.float32))
                           for x in jax.tree.leaves(t))
                return rr, keep
            return jax.lax.scan(body, r, None, length=4)
        return roll

    setups[tag] = (cfg, runner, mk_chain(ppo), mk_roll(ppo))

for tag, (cfg, runner, chain, roll) in setups.items():
    jax.block_until_ready(jax.tree.leaves(chain(runner).params))
    jax.block_until_ready(jax.tree.leaves(roll(runner)))
    print("warm", tag, round(time.time() - T0), "s", flush=True)

times = {t: {"iter": [], "roll": []} for t in setups}
for rep in range(6):
    for tag, (cfg, runner, chain, roll) in setups.items():
        t0 = time.perf_counter()
        out = chain(runner)
        jax.block_until_ready(jax.tree.leaves(out.params))
        times[tag]["iter"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = roll(runner)
        jax.block_until_ready(jax.tree.leaves(out))
        times[tag]["roll"].append(time.perf_counter() - t0)

best_tag, best_sps = None, 0.0
for tag, (cfg, *_rest) in setups.items():
    it = sorted(times[tag]["iter"])
    rl = sorted(times[tag]["roll"])
    med_it = it[len(it) // 2] / 4
    med_rl = rl[len(rl) // 2] / 4
    sps = round(cfg.batch_size / med_it)
    if sps > best_sps:
        best_tag, best_sps = tag, sps
    emit({"stage": "A", "config": tag,
          "ms_per_iter_median": round(med_it * 1e3, 2),
          "ms_per_rollout_median": round(med_rl * 1e3, 2),
          "env_steps_per_s_median": sps,
          "iter_spread_ms": [round(x / 4 * 1e3, 2) for x in it]})
del setups

# ---- stage B ----------------------------------------------------------------
CFG_B = ARMS[best_tag if best_sps >= 20_000_000 else "xla-bf16"]


def curve(seed, budget=4_000_000_000):
    ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), CFG_B)
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
                     "lr": CFG_B.learning_rate,
                     "compute_dtype": CFG_B.compute_dtype,
                     "fused_rollout_forward": CFG_B.fused_rollout_forward},
          "train_wall_s": round(time.time() - t0),
          "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
          "solved_at_env_steps": solved[0]["env_steps"] if solved else None,
          "best_eval": max((r["eval_mean_reward"] for r in rows),
                           default=None),
          "rows": rows[::4] + rows[-1:]})
    return bool(solved)


n = sum(curve(seed) for seed in (0, 1))
emit({"stage": "verdict", "arm": CFG_B.compute_dtype
      + ("/rk8" if CFG_B.fused_rollout_forward else ""),
      "best_A_sps": best_sps, "best_A_tag": best_tag,
      "solved": n, "of": 2})
print("done", round(time.time() - T0), "s", flush=True)
