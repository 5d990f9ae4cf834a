"""Round-4 PPO >=20M part E: the 2-epoch recipe (the epochs knob IS the wall).

Parts C/D established the SGD phase runs at ~90M row-updates/s in BOTH the
XLA epoch scan and the fused Mosaic kernel (3ep x 1M rows = 37-39 ms;
round-3's 10ep x 1M = 109 ms — cost is proportional to rows processed, not
to minibatch partitioning, and bf16 compute changes nothing). Two
independent implementations at the same throughput = a hardware floor for
this net; the only remaining first-order lever is processing FEWER rows:
epochs. 2ep x 128mb projects to ~25 ms SGD -> ~50 ms/iter -> ~21M
env-steps/s.

  A — f32 iteration timings for (2ep, 128mb): XLA epoch and fused kernel
      (chunk 1024, part D's winner).
  B — mode-9 solve curves (bar: eval >= 24000, 3B budget): 2 seeds at
      lr 2e-4; if a seed misses, a 3e-4 retry for that seed (fewer updates
      per datum may want a larger step).

Run (holds the TPU):
    timeout 7200 python docs/artifacts/ppo_20m_r4e.py
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

OUT = f"{ART}/ppo_20m_r4e_tpu.jsonl"
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


def recipe(lr=2e-4, **kw):
    return PPOConfig(
        num_envs=8192, rollout_steps=128, num_epochs=2, num_minibatches=128,
        learning_rate=lr, clip_eps=0.1, init_log_std=-1.6, **kw,
    )


# ---- stage A ----------------------------------------------------------------
variants = {
    "xla": {},
    "fused1024": dict(fused_sgd=True, fused_sgd_chunk=1024),
}
best_name, best_sps = None, 0.0
for name, kw in variants.items():
    cfg = recipe(**kw)
    try:
        ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
        runner = ppo.init(jax.random.PRNGKey(0))
        it = jax.jit(ppo.train_iteration)
        dt = timeit(it, runner)
        dt_roll = timeit(jax.jit(ppo._rollout), runner)
        del runner
        sps = cfg.batch_size / dt
        if sps > best_sps:
            best_name, best_sps = name, sps
        emit({"stage": "A", "variant": name, "epochs": 2, "minibatches": 128,
              "ms_per_iter": round(dt * 1e3, 2),
              "ms_rollout": round(dt_roll * 1e3, 2),
              "ms_sgd_phase": round((dt - dt_roll) * 1e3, 2),
              "env_steps_per_s": round(sps)})
    except Exception as e:
        emit({"stage": "A", "variant": name, "error": repr(e)[:300]})

# ---- stage B: solve curves --------------------------------------------------
BAR = 24_000.0
kw = variants.get(best_name, {})


def curve(seed, lr):
    cfg = recipe(lr=lr, **kw)
    ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
    rows = []

    def on_metrics(u, row):
        rows.append(row)
        print(f"s{seed}-lr{lr}", json.dumps(
            {k: round(v, 1) for k, v in row.items()
             if k in ("update", "env_steps", "steps_per_s",
                      "eval_mean_reward", "eval_mean_length")}), flush=True)

    t0 = time.time()
    train(ppo, TrainConfig(
        total_timesteps=3_000_000_000, eval_every_updates=40,
        eval_episodes=16, seed=seed,
    ), on_metrics=on_metrics)
    solved = [r for r in rows if r["eval_mean_reward"] >= BAR]
    emit({"stage": "B", "seed": seed, "lr": lr, "variant": best_name,
          "recipe": {"num_envs": 8192, "epochs": 2, "minibatches": 128,
                     "net": "(256,256) hovering arch", **kw},
          "train_wall_s": round(time.time() - t0),
          "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
          "solved_at_env_steps": solved[0]["env_steps"] if solved else None,
          "best_eval": max((r["eval_mean_reward"] for r in rows),
                           default=None),
          "rows": rows[::4] + rows[-1:]})
    return bool(solved)


for seed in (0, 1):
    if not curve(seed, 2e-4):
        curve(seed, 3e-4)

print("PPO-20M-E DONE in", round(time.time() - T0), "s", flush=True)
