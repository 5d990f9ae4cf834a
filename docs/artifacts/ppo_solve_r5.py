"""Round-5 mode-9 wall-clock-to-solve campaign (VERDICT r4 next-round #3).

Round 4 measured the steps/s ceiling (~19.9M/chip at 3 epochs) but never
optimized TIME-TO-SOLVE: the robust 32K recipe solves in ~85-90 s of
device time (1.64-1.76B steps), while the 2.3x more sample-efficient
8192 recipe (0.67-0.92B, ~45-60 s) is a robustness coin flip (r4q: fresh
XLA seeds fail 2/3 with the C2 signature). Lever: ENV-COUNT GROWTH —
run the sample-efficient 8192 recipe through the early ramp, then switch
to the 32768 batch for the C2 breakout, carrying params + Adam moments
across the switch (both phases use the same flattened optimizer tree).

  G — growth recipe, 4 seeds: 8192x128 (3ep x 128mb, lr 2e-4) for the
      first SWITCH_STEPS, then 32768x128 (3ep x 256mb, lr 2e-4,
      minibatch 16384 like r4m) to the 4B cap.
  Accounting: wall_to_solve = cumulative train-iteration device time
      (compile + eval excluded) until the first 16-episode eval >= 24000
      — the same derivation behind the r4 45-60s/85-90s numbers; raw
      process wall also recorded.
  Bar (VERDICT #3): >= 4/4 seed solves AND wall_to_solve < 60 s, else
      the Pareto writeup stands on this data.

Run (holds the TPU):
    timeout 14400 python docs/artifacts/ppo_solve_r5.py
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
from pyflyt_tpu.rl import PPO, PPOConfig  # noqa: E402

OUT = f"{ART}/ppo_solve_r5_tpu.jsonl"
open(OUT, "w").close()

ENV_KW = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)
BAR = 24_000.0
BUDGET = 4_000_000_000
SWITCH_STEPS = 300_000_000  # ~286 updates of the 8192 recipe
EVAL_EVERY = 10
SEEDS = (0, 1, 2, 3)

CFG_SMALL = PPOConfig(num_envs=8192, rollout_steps=128, num_epochs=3,
                      num_minibatches=128, learning_rate=2e-4,
                      clip_eps=0.1, init_log_std=-1.6)
CFG_BIG = PPOConfig(num_envs=32768, rollout_steps=128, num_epochs=3,
                    num_minibatches=256, learning_rate=2e-4,
                    clip_eps=0.1, init_log_std=-1.6)


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


class Phase:
    """One recipe phase with its own jitted iteration + eval programs."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
        self.it = jax.jit(self.ppo.train_iteration)
        self.ev = jax.jit(
            lambda p, k: self.ppo.evaluate(p, k, num_episodes=16)
        )

    def fresh_runner(self, seed, params=None, opt_state=None):
        r = self.ppo.init(jax.random.PRNGKey(seed))
        if params is not None:
            r = r.replace(params=params)
        if opt_state is not None:
            r = r.replace(opt_state=opt_state)
        return r

    def warmup(self, seed=0):
        r = self.fresh_runner(seed)
        out = self.it(r)
        jax.block_until_ready(jax.tree.leaves(out[0].params))
        s = self.ev(r.params, jax.random.PRNGKey(0))
        jax.block_until_ready(jax.tree.leaves(s))


PHASES = {"small": Phase(CFG_SMALL), "big": Phase(CFG_BIG)}
for nm, ph in PHASES.items():
    t0 = time.time()
    ph.warmup()
    print(f"compiled {nm} in {round(time.time() - t0)}s", flush=True)


def run_seed(seed):
    rows = []
    train_time = 0.0  # cumulative device/iteration time, eval excluded
    env_steps = 0
    t_raw = time.time()
    solved_at = None

    def do_eval(ph, params, tag, u):
        nonlocal solved_at
        s = ph.ev(params, jax.random.fold_in(jax.random.PRNGKey(97), u))
        r = {k: float(v) for k, v in s.items()}
        row = {"phase": tag, "update": u, "env_steps": env_steps,
               "train_time_s": round(train_time, 1),
               "eval_mean_reward": r["mean_reward"],
               "eval_mean_length": r["mean_length"]}
        rows.append(row)
        if solved_at is None and r["mean_reward"] >= BAR:
            # confirm: 2 more independent 16-episode evals, need 2/3 total
            # >= BAR (a single transient spike must not count as a solve)
            confirms = sum(
                float(ph.ev(params, jax.random.fold_in(
                    jax.random.PRNGKey(31 + j), u))["mean_reward"]) >= BAR
                for j in (0, 1)
            )
            if 1 + confirms >= 2:
                solved_at = {"env_steps": env_steps,
                             "wall_to_solve_s": round(train_time, 1),
                             "raw_wall_s": round(time.time() - t_raw, 1),
                             "confirm_evals": 1 + confirms}
        print(f"s{seed}", json.dumps(row), flush=True)
        return r["mean_reward"]

    # phase 1: small
    ph = PHASES["small"]
    runner = ph.fresh_runner(seed)
    u = 0
    while env_steps < SWITCH_STEPS and solved_at is None:
        t0 = time.perf_counter()
        runner, m = ph.it(runner)
        jax.block_until_ready(jax.tree.leaves(runner.params))
        train_time += time.perf_counter() - t0
        u += 1
        env_steps += ph.cfg.batch_size
        if u % EVAL_EVERY == 0:
            do_eval(ph, runner.params, "small", u)

    # phase 2: big (carry params + Adam moments; fresh env states)
    if solved_at is None:
        params, opt_state = runner.params, runner.opt_state
        del runner
        ph = PHASES["big"]
        runner = ph.fresh_runner(seed + 100, params=params,
                                 opt_state=opt_state)
        while env_steps < BUDGET and solved_at is None:
            t0 = time.perf_counter()
            runner, m = ph.it(runner)
            jax.block_until_ready(jax.tree.leaves(runner.params))
            train_time += time.perf_counter() - t0
            u += 1
            env_steps += ph.cfg.batch_size
            if u % EVAL_EVERY == 0:
                do_eval(ph, runner.params, "big", u)

    best = max((r["eval_mean_reward"] for r in rows), default=None)
    emit({"stage": "G", "seed": seed,
          "switch_steps": SWITCH_STEPS,
          "solved": solved_at is not None, "solved_at": solved_at,
          "best_eval": best,
          "total_train_time_s": round(train_time, 1),
          "rows": rows[::4] + rows[-1:]})
    del runner
    return solved_at


results = [run_seed(s) for s in SEEDS]
ok = [r for r in results if r is not None]
emit({"stage": "SUMMARY", "seeds": len(SEEDS), "solves": len(ok),
      "wall_to_solve_s": [r["wall_to_solve_s"] for r in ok],
      "env_steps_to_solve": [r["env_steps"] for r in ok]})
print("done", round(time.time() - T0), "s", flush=True)
