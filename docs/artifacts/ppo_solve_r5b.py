"""Round-5 time-to-solve lever #2: two-phase lr schedule on the 32K recipe.

Lever #1 (ppo_solve_r5.py, env-count growth 8192->32768 at 0.3B) measured
WORSE than both pure recipes (0/4 solves in 4B vs r4m's 4/4) — the switch
inherits the 8192 recipe's C2-breakout fragility without the 32K batch's
stabilization. Lever #2 keeps the robust 32K batch throughout and
schedules the learning rate instead: lr 4e-4 for the first 150 updates
(0.63B steps — the pre-breakout ramp, where the 32K batch's gradient
noise scale should tolerate a hotter step), then the proven 2e-4 to the
4B cap. Runner (params + Adam moments + env states) carries across the
switch exactly; only the scale(-lr) constant changes.

Same accounting and 2/3-confirmation solve criterion as ppo_solve_r5.
2 seeds; bar: wall_to_solve < the r4m-derived 85-90 s.

Run (holds the TPU):
    timeout 10800 python docs/artifacts/ppo_solve_r5b.py
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
from pyflyt_tpu.rl import PPO, PPOConfig  # noqa: E402

OUT = f"{ART}/ppo_solve_r5b_tpu.jsonl"
open(OUT, "w").close()

ENV_KW = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)
BAR = 24_000.0
BUDGET = 4_000_000_000
HOT_UPDATES = 150
EVAL_EVERY = 10
SEEDS = (0, 1)


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


def mk(lr):
    return PPOConfig(num_envs=32768, rollout_steps=128, num_epochs=3,
                     num_minibatches=256, learning_rate=lr,
                     clip_eps=0.1, init_log_std=-1.6)


PPOS = {lr: PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), mk(lr))
        for lr in (4e-4, 2e-4)}
ITS = {lr: jax.jit(p.train_iteration) for lr, p in PPOS.items()}
EV = jax.jit(lambda p, k: PPOS[2e-4].evaluate(p, k, num_episodes=16))

# warmup both programs
r0 = PPOS[4e-4].init(jax.random.PRNGKey(0))
for lr in (4e-4, 2e-4):
    out = ITS[lr](r0)
    jax.block_until_ready(jax.tree.leaves(out[0].params))
s = EV(r0.params, jax.random.PRNGKey(0))
jax.block_until_ready(jax.tree.leaves(s))
del r0, out, s
print(f"compiled in {round(time.time() - T0)}s", flush=True)

per_update = 32768 * 128


def run_seed(seed):
    rows = []
    train_time = 0.0
    solved_at = None
    t_raw = time.time()
    runner = PPOS[4e-4].init(jax.random.PRNGKey(seed))
    u = 0
    while u * per_update < BUDGET and solved_at is None:
        lr = 4e-4 if u < HOT_UPDATES else 2e-4
        t0 = time.perf_counter()
        runner, m = ITS[lr](runner)
        jax.block_until_ready(jax.tree.leaves(runner.params))
        train_time += time.perf_counter() - t0
        u += 1
        if u % EVAL_EVERY == 0:
            r = {k: float(v) for k, v in
                 EV(runner.params,
                    jax.random.fold_in(jax.random.PRNGKey(97), u)).items()}
            row = {"update": u, "env_steps": u * per_update, "lr": lr,
                   "train_time_s": round(train_time, 1),
                   "eval_mean_reward": r["mean_reward"],
                   "eval_mean_length": r["mean_length"]}
            rows.append(row)
            print(f"s{seed}", json.dumps(row), flush=True)
            if r["mean_reward"] >= BAR:
                confirms = sum(
                    float(EV(runner.params, jax.random.fold_in(
                        jax.random.PRNGKey(31 + j), u))["mean_reward"])
                    >= BAR for j in (0, 1))
                if 1 + confirms >= 2:
                    solved_at = {"env_steps": u * per_update,
                                 "wall_to_solve_s": round(train_time, 1),
                                 "raw_wall_s": round(time.time() - t_raw, 1),
                                 "confirm_evals": 1 + confirms}
    best = max((r["eval_mean_reward"] for r in rows), default=None)
    emit({"stage": "LR2", "seed": seed, "hot_updates": HOT_UPDATES,
          "solved": solved_at is not None, "solved_at": solved_at,
          "best_eval": best,
          "total_train_time_s": round(train_time, 1),
          "rows": rows[::4] + rows[-1:]})
    del runner
    return solved_at


results = [run_seed(s) for s in SEEDS]
ok = [r for r in results if r is not None]
emit({"stage": "SUMMARY", "seeds": len(SEEDS), "solves": len(ok),
      "wall_to_solve_s": [r["wall_to_solve_s"] for r in ok]})
print("done", round(time.time() - T0), "s", flush=True)
