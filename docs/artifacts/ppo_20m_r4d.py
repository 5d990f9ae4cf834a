"""Round-4 PPO >=20M part D: the fused-SGD epoch kernel on the solve recipe.

Part C killed the bf16 lever: the SGD phase is NOT activation-bandwidth
bound (38.4 vs 39.4 ms — compute_dtype=bfloat16 changes nothing, matching
round 3's finding that XLA already runs f32 matmuls as bf16 MXU passes).
The phase is per-minibatch overhead around tiny matmuls — exactly what the
round-3 fused epoch kernel (ops/pallas_sgd.py, whole epoch in ONE
pallas_call, params+Adam VMEM-resident) removes. Round 3 measured it at
+15% on the 10ep x 64mb recipe at 2048 envs and par at 8192; the new solve
recipe (3ep x 128mb, minibatch 8192 rows) has 384 sequential sub-roofline
steps — the kernel's best case.

  A — f32 iteration timings, fused_sgd=True, chunk in {1024, 2048, 4096},
      vs the XLA epoch (from part C: 64.93 ms / 16.1M env-steps/s).
  B — if best >= 19M: 2-seed mode-9 solve curves (bar: eval >= 24000),
      the curve-equivalence evidence VERDICT item 1 requires.

Run (holds the TPU):
    timeout 7200 python docs/artifacts/ppo_20m_r4d.py
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

OUT = f"{ART}/ppo_20m_r4d_tpu.jsonl"
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


def recipe(**kw):
    return PPOConfig(
        num_envs=8192, rollout_steps=128, num_epochs=3, num_minibatches=128,
        learning_rate=2e-4, clip_eps=0.1, init_log_std=-1.6, **kw,
    )


# ---- stage A: fused-SGD chunk sweep -----------------------------------------
best = (None, 0.0)
for chunk in (1024, 2048, 4096):
    cfg = recipe(fused_sgd=True, fused_sgd_chunk=chunk)
    try:
        ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
        runner = ppo.init(jax.random.PRNGKey(0))
        it = jax.jit(ppo.train_iteration)
        dt = timeit(it, runner)
        dt_roll = timeit(jax.jit(ppo._rollout), runner)
        del runner
        sps = cfg.batch_size / dt
        if sps > best[1]:
            best = (chunk, sps)
        emit({"stage": "A", "fused_sgd_chunk": chunk,
              "ms_per_iter": round(dt * 1e3, 2),
              "ms_rollout": round(dt_roll * 1e3, 2),
              "ms_sgd_phase": round((dt - dt_roll) * 1e3, 2),
              "env_steps_per_s": round(sps)})
    except Exception as e:
        emit({"stage": "A", "fused_sgd_chunk": chunk,
              "error": repr(e)[:300]})

# ---- stage B: 2-seed solve curves with the winning config -------------------
BAR = 24_000.0
if best[0] is not None and best[1] >= 19e6:
    for seed in (0, 1):
        cfg = recipe(fused_sgd=True, fused_sgd_chunk=best[0])
        ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
        rows = []

        def on_metrics(u, row):
            rows.append(row)
            print(f"s{seed}", json.dumps(
                {k: round(v, 1) for k, v in row.items()
                 if k in ("update", "env_steps", "steps_per_s",
                          "eval_mean_reward", "eval_mean_length")}),
                flush=True)

        t0 = time.time()
        train(ppo, TrainConfig(
            total_timesteps=3_000_000_000, eval_every_updates=40,
            eval_episodes=16, seed=seed,
        ), on_metrics=on_metrics)
        solved = [r for r in rows if r["eval_mean_reward"] >= BAR]
        emit({"stage": "B", "seed": seed,
              "recipe": {"num_envs": 8192, "epochs": 3, "minibatches": 128,
                         "lr": 2e-4, "fused_sgd": True,
                         "fused_sgd_chunk": best[0],
                         "net": "(256,256) hovering arch"},
              "train_wall_s": round(time.time() - t0),
              "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
              "solved_at_env_steps": solved[0]["env_steps"] if solved else None,
              "best_eval": max((r["eval_mean_reward"] for r in rows),
                               default=None),
              "rows": rows[::4] + rows[-1:]})
else:
    emit({"stage": "B", "skipped": True, "best": best})

print("PPO-20M-D DONE in", round(time.time() - T0), "s", flush=True)
