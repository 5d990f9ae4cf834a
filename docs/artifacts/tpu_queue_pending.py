"""Queued TPU workload: runs as soon as the axon tunnel is healthy.

1. PPO compute_dtype experiment: f32 vs bf16 iteration throughput + short
   learning-curve equivalence on the mode-9 hovering recipe
   -> docs/artifacts/ppo_bf16_curves_tpu.jsonl
2. bench_suite.py (parity gates incl. the new QuadX-Waypoints one + all
   numbers) -> docs/artifacts/bench_suite_r2b_tpu.jsonl
3. bench.py sanity -> stdout
"""
import json, subprocess, sys, time

import jax

t0 = time.time()
print("devices:", jax.devices(), flush=True)

import jax.numpy as jnp
from pyflyt_tpu.envs.quadx_mod import QuadXModHoveringEnv
from pyflyt_tpu.rl import PPO, PPOConfig

ART = "/root/repo/docs/artifacts/ppo_bf16_curves_tpu.jsonl"
ITERS = 700

env = QuadXModHoveringEnv(
    flight_mode=9, orn_conv="NED_FRD", control_hz=80, simulate_wind=True
)
with open(ART, "w") as f:
    for dtype in ("float32", "bfloat16"):
        for seed in (0, 1):
            cfg = PPOConfig(
                num_envs=2048, rollout_steps=128, num_epochs=10,
                num_minibatches=64, learning_rate=1e-4, clip_eps=0.1,
                init_log_std=-1.6, compute_dtype=dtype,
            )
            ppo = PPO(env, cfg)
            runner = ppo.init(jax.random.PRNGKey(seed))
            it = jax.jit(ppo.train_iteration)
            runner, m = it(runner)  # compile
            jax.block_until_ready(m["mean_reward"])
            t1 = time.time()
            curve = []
            for i in range(1, ITERS + 1):
                runner, m = it(runner)
                if i % 50 == 0:
                    curve.append({
                        "iter": i,
                        "mean_reward": round(float(m["mean_reward"]), 4),
                    })
            jax.block_until_ready(m["mean_reward"])
            wall = time.time() - t1
            rec = {
                "compute_dtype": dtype, "seed": seed, "iters": ITERS,
                "env_steps": ITERS * cfg.batch_size,
                "wall_s": round(wall, 2),
                "env_steps_per_s": round(ITERS * cfg.batch_size / wall),
                "ms_per_iter": round(1000 * wall / ITERS, 2),
                "curve": curve,
            }
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print("done:", dtype, "seed", seed,
                  rec["env_steps_per_s"], "steps/s", flush=True)

print("ppo experiment done at", time.time() - t0, flush=True)

r = subprocess.run(
    [sys.executable, "/root/repo/bench_suite.py"],
    capture_output=True, text=True, timeout=5400, cwd="/root/repo",
)
lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
with open("/root/repo/docs/artifacts/bench_suite_r2b_tpu.jsonl", "w") as f:
    f.write("\n".join(lines) + "\n")
print("SUITE rc:", r.returncode, flush=True)
print("\n".join(lines), flush=True)
if r.returncode != 0:
    print(r.stdout[-2000:], r.stderr[-3000:], flush=True)

r = subprocess.run(
    [sys.executable, "/root/repo/bench.py"],
    capture_output=True, text=True, timeout=3000, cwd="/root/repo",
)
print("BENCH rc:", r.returncode, flush=True)
print(r.stdout.strip()[-500:], flush=True)
print("all done at", time.time() - t0, flush=True)
