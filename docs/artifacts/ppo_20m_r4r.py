"""Round-4 part R: in-process A/B of the fused rollout forward at 32K.

Probe P stage A1 measured the rollout-kernel config at 16.8M env-steps/s —
below the 19.35M XLA number from r4m — but r4m ran in a DIFFERENT process
and per-process tunnel variance is 15-24% (r4k/r4l). This probe removes
that confound: one process, interleaved chained timings (A, B, A, B) of

  xla — the r4m headline config (32768, 3ep x 256mb, XLA everything)
  rk  — same + fused_rollout_forward

plus rollout-phase-only chained timings for both, to localize any delta.

Run (holds the TPU):
    timeout 5400 python docs/artifacts/ppo_20m_r4r.py
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
from pyflyt_tpu.rl import PPO, PPOConfig  # noqa: E402

OUT = f"{ART}/ppo_20m_r4r_tpu.jsonl"
open(OUT, "w").close()

ENV_KW = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:400], flush=True)


CFG_X = PPOConfig(num_envs=32768, rollout_steps=128, num_epochs=3,
                  num_minibatches=256, learning_rate=2e-4, clip_eps=0.1,
                  init_log_std=-1.6)
CFG_R = dataclasses.replace(CFG_X, fused_rollout_forward=True)

setups = {}
for tag, cfg in (("xla", CFG_X), ("rk", CFG_R)):
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
        import jax.numpy as jnp

        @jax.jit
        def roll(r):
            def body(rr, _):
                rr, t = p._rollout(rr)
                # keep every traj field alive — otherwise XLA DCEs the
                # value head / logp in this arm (the pallas kernel arm
                # can't DCE inside the call) and the A/B is biased
                keep = sum(jnp.sum(x) for x in jax.tree.leaves(t))
                return rr, keep
            return jax.lax.scan(body, r, None, length=4)
        return roll

    setups[tag] = (cfg, runner, mk_chain(ppo), mk_roll(ppo))

# warm up all compiled programs first
for tag, (cfg, runner, chain, roll) in setups.items():
    jax.block_until_ready(jax.tree.leaves(chain(runner).params))
    jax.block_until_ready(jax.tree.leaves(roll(runner)))
    print("warm", tag, round(time.time() - T0), "s", flush=True)

# interleaved measurement: 6 rounds of each, alternating
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

for tag, (cfg, *_rest) in setups.items():
    it = sorted(times[tag]["iter"])
    rl = sorted(times[tag]["roll"])
    med_it = it[len(it) // 2] / 4
    med_rl = rl[len(rl) // 2] / 4
    emit({"stage": "AB", "config": tag,
          "ms_per_iter_median": round(med_it * 1e3, 2),
          "ms_per_rollout_median": round(med_rl * 1e3, 2),
          "env_steps_per_s_median": round(cfg.batch_size / med_it),
          "rollout_env_steps_per_s": round(cfg.batch_size / med_rl),
          "iter_spread_ms": [round(x / 4 * 1e3, 2) for x in it],
          })
print("done", round(time.time() - T0), "s", flush=True)
