"""Round-4 PPO learner-gap probe (VERDICT items 1 + 3).

Round 3 left full PPO training at 7.8-8.09M env-steps/s @ 8192 envs while the
rollout engine does 121.5M: the iteration is SGD-phase-bound (num_epochs x
num_minibatches sequential minibatch steps). Hypothesis from the round-3
numbers: at 8192 envs the SGD phase is already near its per-sample
throughput asymptote (t_iter ~= t_rollout + epochs * c * batch), so scaling
num_envs alone cannot reach 20M -- cutting epochs (with a curve-equivalence
artifact, the VERDICT's own lever "(b)/(c)") is required. This probe measures
the actual (num_envs, num_epochs) -> ms/iter surface so the >=20M config can
be picked on evidence, and re-measures the corrupt MFU artifact
(ppo_scaling_mfu_tpu.jsonl row 3 claimed 107% of f32 peak -- an unsynced
timing) with block_until_ready.

Reference counterpart being beaten: the whole SB3 PPO + SubprocVecEnv stack
at /root/reference/PyFlyt/rl_training/hovering/training.py:159-206.

Run (holds the TPU):
    timeout 5400 python docs/artifacts/ppo_scale_probe_r4.py
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

from pyflyt_tpu.envs.quadx_mod import QuadXModHoveringEnv  # noqa: E402
from pyflyt_tpu.envs.quadx_mod.packed_hovering import (  # noqa: E402
    PackedQuadXModHoveringEnv,
)
from pyflyt_tpu.rl import PPO, PPOConfig  # noqa: E402


def timeit(fn, *args, reps=3, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.perf_counter() - t0) / reps


def recipe(num_envs, epochs, minibatches=64, **kw):
    return PPOConfig(
        num_envs=num_envs, rollout_steps=128, num_epochs=epochs,
        num_minibatches=minibatches, learning_rate=1e-4, clip_eps=0.1,
        init_log_std=-1.6, **kw,
    )


def make_env(packed):
    kw = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)
    return PackedQuadXModHoveringEnv.create(**kw) if packed \
        else QuadXModHoveringEnv(**kw)


def measure(cfg, packed, want_flops=False, reps=3):
    ppo = PPO(make_env(packed), cfg)
    runner = ppo.init(jax.random.PRNGKey(0))
    it = jax.jit(ppo.train_iteration)
    flops = None
    if want_flops:
        try:
            ca = it.lower(runner).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca["flops"])
        except Exception as e:  # cost_analysis is best-effort
            print("cost_analysis failed:", e, flush=True)
    dt = timeit(it, runner, reps=reps)
    # rollout phase alone (same compiled network/env)
    roll = jax.jit(ppo._rollout)
    dt_roll = timeit(roll, runner, reps=reps)
    del runner
    return dt, dt_roll, flops


rows = []


def emit(path, row):
    row = dict(row, wall_s=round(time.time() - T0))
    rows.append(row)
    with open(path, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


PROBE = f"{ART}/ppo_scale_probe_r4_tpu.jsonl"
open(PROBE, "w").close()

# ---- part 1: (num_envs, epochs) surface, packed native-batch rollout ------
GRID = [
    (8192, 10, 64), (8192, 3, 64),
    (32768, 10, 64), (32768, 4, 64), (32768, 3, 64),
    (65536, 10, 64), (65536, 4, 64), (65536, 3, 64), (65536, 3, 32),
]
for num_envs, epochs, mbs in GRID:
    cfg = recipe(num_envs, epochs, mbs)
    try:
        dt, dt_roll, _ = measure(cfg, packed=True)
    except Exception as e:
        emit(PROBE, {"num_envs": num_envs, "epochs": epochs,
                     "minibatches": mbs, "error": repr(e)[:300]})
        continue
    emit(PROBE, {
        "num_envs": num_envs, "epochs": epochs, "minibatches": mbs,
        "rollout": "packed", "ms_per_iter": round(dt * 1e3, 2),
        "ms_rollout": round(dt_roll * 1e3, 2),
        "ms_sgd_phase": round((dt - dt_roll) * 1e3, 2),
        "env_steps_per_s": round(cfg.batch_size / dt),
    })

# fused-SGD kernel at scale: does the VMEM-resident epoch kernel beat the
# XLA epoch once minibatches are huge?
for num_envs in (32768, 65536):
    cfg = recipe(num_envs, 10, 64, fused_sgd=True)
    try:
        dt, dt_roll, _ = measure(cfg, packed=True)
        emit(PROBE, {
            "num_envs": num_envs, "epochs": 10, "minibatches": 64,
            "rollout": "packed", "sgd": "fused_kernel",
            "ms_per_iter": round(dt * 1e3, 2),
            "ms_rollout": round(dt_roll * 1e3, 2),
            "ms_sgd_phase": round((dt - dt_roll) * 1e3, 2),
            "env_steps_per_s": round(cfg.batch_size / dt),
        })
    except Exception as e:
        emit(PROBE, {"num_envs": num_envs, "sgd": "fused_kernel",
                     "error": repr(e)[:300]})

# ---- part 2: honest MFU artifact (rewrites ppo_scaling_mfu_tpu.jsonl) -----
MFU = f"{ART}/ppo_scaling_mfu_tpu.jsonl"
V5E_BF16_PEAK = 197e12  # v5e per-chip peak, bf16
V5E_F32_PEAK = 49.3e12
mfu_rows = []
for num_envs in (2048, 4096, 8192):
    cfg = recipe(num_envs, 10, 64)
    dt, dt_roll, flops = measure(cfg, packed=False, want_flops=True)
    row = {
        "compute_dtype": "float32", "num_envs": num_envs,
        "ms_per_iter": round(dt * 1e3, 2),
        "env_steps_per_s": round(cfg.batch_size / dt),
        "xla_flops_per_iter": flops,
        "achieved_tflops": round(flops / dt / 1e12, 2) if flops else None,
        "mfu_vs_bf16_peak": round(flops / dt / V5E_BF16_PEAK, 4)
        if flops else None,
        "mfu_vs_f32_peak": round(flops / dt / V5E_F32_PEAK, 4)
        if flops else None,
        "note": "round-4 re-measurement, block_until_ready before/after "
                "(the round-3 8192 row was an unsynced artifact)",
    }
    mfu_rows.append(row)
    print(json.dumps(row), flush=True)
with open(MFU, "w") as f:
    for row in mfu_rows:
        f.write(json.dumps(row) + "\n")

print("PROBE DONE in", round(time.time() - T0), "s", flush=True)
