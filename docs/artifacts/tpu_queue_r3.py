"""Round-3 TPU workload queue: run as soon as the axon tunnel is healthy.

    timeout 7200 python docs/artifacts/tpu_queue_r3.py

Stages (each isolated; a failure doesn't block the rest):
1. bench_suite.py — ALL parity gates (5 fused envs incl. QuadX-Waypoints +
   the 5 quadx kernel-envelope gates: mode9/NED/wind) + every number incl.
   the refolded dogfight kernel and the QuadX-Gates ray-cast bench
   -> docs/artifacts/bench_suite_r3_tpu.jsonl
2. bench.py sanity -> stdout (the driver recaptures it at round end)
3. PPO compute_dtype experiment (f32 vs bf16 on the mode-9 hovering recipe)
   -> docs/artifacts/ppo_bf16_curves_tpu.jsonl
4. PPO num_envs scaling sweep + measured MFU (XLA cost_analysis flops /
   wall / v5e peak) -> docs/artifacts/ppo_scaling_mfu_tpu.jsonl
5. Dogfight refolded-kernel tile sweep -> docs/artifacts/
   dogfight_layout_sweep_tpu.jsonl
6. trajectory_following_slow training with the solved mode-8/9 recipe
   -> docs/artifacts/traj_slow_training_tpu.jsonl
"""

import json
import subprocess
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")  # the script lives in docs/artifacts

import jax

T0 = time.time()
print("devices:", jax.devices(), flush=True)

ART = "/root/repo/docs/artifacts"


def stage(name):
    def deco(fn):
        def run():
            t = time.time()
            print(f"=== stage {name} start @ {round(t - T0)}s", flush=True)
            try:
                fn()
                print(f"=== stage {name} OK in {round(time.time() - t)}s",
                      flush=True)
            except Exception:
                print(f"=== stage {name} FAILED:", flush=True)
                traceback.print_exc()
        return run
    return deco


@stage("bench_suite")
def s1():
    r = subprocess.run(
        [sys.executable, "/root/repo/bench_suite.py"],
        capture_output=True, text=True, timeout=5400, cwd="/root/repo",
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    with open(f"{ART}/bench_suite_r3_tpu.jsonl", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("SUITE rc:", r.returncode, flush=True)
    print("\n".join(lines), flush=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-3000:], flush=True)


@stage("bench.py")
def s2():
    r = subprocess.run(
        [sys.executable, "/root/repo/bench.py"],
        capture_output=True, text=True, timeout=3000, cwd="/root/repo",
    )
    print("BENCH rc:", r.returncode, flush=True)
    print(r.stdout.strip()[-500:], flush=True)


@stage("ppo_bf16_curves")
def s3():
    from pyflyt_tpu.envs.quadx_mod import QuadXModHoveringEnv
    from pyflyt_tpu.rl import PPO, PPOConfig

    ITERS = 700
    env = QuadXModHoveringEnv(
        flight_mode=9, orn_conv="NED_FRD", control_hz=80, simulate_wind=True
    )
    with open(f"{ART}/ppo_bf16_curves_tpu.jsonl", "w") as f:
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
                print("bf16-exp:", dtype, "seed", seed,
                      rec["env_steps_per_s"], "steps/s", flush=True)


@stage("ppo_scaling_mfu")
def s4():
    from pyflyt_tpu.envs.quadx_mod import QuadXModHoveringEnv
    from pyflyt_tpu.rl import PPO, PPOConfig

    # v5e peaks (per chip): 197 TFLOP/s bf16 MXU, ~49 TFLOP/s fp32
    PEAK_BF16, PEAK_F32 = 197e12, 49.3e12
    env = QuadXModHoveringEnv(
        flight_mode=9, orn_conv="NED_FRD", control_hz=80, simulate_wind=True
    )
    ITERS = 60
    with open(f"{ART}/ppo_scaling_mfu_tpu.jsonl", "w") as f:
        for dtype in ("float32", "bfloat16"):
            for num_envs in (2048, 4096, 8192):
                cfg = PPOConfig(
                    num_envs=num_envs, rollout_steps=128, num_epochs=10,
                    num_minibatches=64, learning_rate=1e-4, clip_eps=0.1,
                    init_log_std=-1.6, compute_dtype=dtype,
                )
                ppo = PPO(env, cfg)
                runner = ppo.init(jax.random.PRNGKey(0))
                lowered = jax.jit(ppo.train_iteration).lower(runner)
                compiled = lowered.compile()
                ca = compiled.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                flops = float(ca.get("flops", float("nan"))) if ca else float("nan")
                runner, m = compiled(runner)
                jax.block_until_ready(m["mean_reward"])
                t1 = time.time()
                for _ in range(ITERS):
                    runner, m = compiled(runner)
                jax.block_until_ready(m["mean_reward"])
                wall = (time.time() - t1) / ITERS
                rec = {
                    "compute_dtype": dtype, "num_envs": num_envs,
                    "ms_per_iter": round(1000 * wall, 2),
                    "env_steps_per_s": round(cfg.batch_size / wall),
                    "xla_flops_per_iter": flops,
                    "achieved_tflops": round(flops / wall / 1e12, 2),
                    "mfu_vs_bf16_peak": round(flops / wall / PEAK_BF16, 4),
                    "mfu_vs_f32_peak": round(flops / wall / PEAK_F32, 4),
                }
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print("mfu:", rec, flush=True)


@stage("dogfight_sweep")
def s5():
    import jax.numpy as jnp

    from pyflyt_tpu.envs.ma_fixedwing_dogfight import MAFixedwingDogfightEnv
    from pyflyt_tpu.envs.packed_dogfight import PackedMAFixedwingDogfightEnv
    from pyflyt_tpu.ops import pallas_dogfight as pdg

    with open(f"{ART}/dogfight_layout_sweep_tpu.jsonl", "w") as f:
        for matches in (2048, 8192):
            for tile in (256, 512, 1024):
                if 2 * matches // 8 % tile and tile > 2 * matches // 8:
                    continue
                base = MAFixedwingDogfightEnv(noisy_motors=False)
                penv = PackedMAFixedwingDogfightEnv(base=base)
                keys = jax.random.split(jax.random.PRNGKey(0), matches)
                state, _ = jax.jit(penv.reset)(keys)
                act = jnp.tile(
                    jnp.asarray([0.0, 0.0, 0.0, 0.8]), (matches, 2, 1)
                )
                # patch the tile through a wrapper step closure
                orig = pdg.packed_dogfight_step

                def stepped(s):
                    def body(s, _):
                        s, out = penv.step(s, act)
                        return s, out.reward
                    return jax.lax.scan(body, s, None, length=32)

                pdg_step = jax.jit(stepped)
                import functools
                pdg.packed_dogfight_step = functools.partial(orig, tile=tile)
                try:
                    out = pdg_step(state)
                    jax.block_until_ready(jax.tree.leaves(out)[0])
                    t1 = time.time()
                    reps = 3
                    for _ in range(reps):
                        out = pdg_step(state)
                    jax.block_until_ready(jax.tree.leaves(out)[0])
                    dt = (time.time() - t1) / reps
                finally:
                    pdg.packed_dogfight_step = orig
                rec = {
                    "layout": "drone-sublane-fold",
                    "matches": matches, "tile": tile,
                    "agent_steps_per_s": round(matches * 2 * 32 / dt),
                }
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print("dogfight:", rec, flush=True)


@stage("traj_slow_training")
def s6():
    cmd = [
        sys.executable, "-m",
        "pyflyt_tpu.rl_training.trajectory_following", "train",
        "--variant", "slow", "--num_envs", "2048", "--rollout_steps", "128",
        "--n_epochs", "10", "--num_minibatches", "64",
        "--learning_rate", "1e-4", "--clip_eps", "0.1",
        "--init_log_std", "-1.6", "--log_std_min", "-2.5",
        "--log_std_max", "-1.0", "--total_timesteps", "500000000",
        "--eval_every_updates", "50",
        "--log_dir", "/tmp/traj_slow_r3",
    ]
    r = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, cwd="/root/repo",
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    with open(f"{ART}/traj_slow_training_tpu.jsonl", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("traj-slow rc:", r.returncode, "updates:", len(lines), flush=True)
    print("\n".join(lines[-3:]), flush=True)
    if r.returncode != 0:
        print(r.stderr[-3000:], flush=True)


if __name__ == "__main__":
    for s in (s1, s2, s3, s4, s5, s6):
        s()
    print("queue done at", round(time.time() - T0), "s", flush=True)
