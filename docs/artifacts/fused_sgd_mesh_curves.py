"""fused_sgd on a 2-device mesh: curve-level equivalence evidence.

VERDICT r4 weak #5 / next-round #5: under a >1-device mesh the fused-SGD
epoch kernel runs LOCAL-Adam (grad-norm clip + Adam on device-local
minibatch gradients) with params/moments pmean'd once per epoch — a
documented deviation from the global-minibatch XLA optimizer
(rl/ppo.py, PPOConfig.fused_sgd note). This produces the curve evidence:

  arm xla    — exact global-optimizer XLA path, single process
  arm fused2 — fused_sgd on a 2-device CPU mesh (the deviated semantics,
               kernel in interpret mode)

3 seeds x 600 updates of QuadX-Hover (small net); mean_reward curves +
final-params drift are recorded. Equivalence bar: the fused2 curve reaches
the xla arm's final reward band (within the seed spread) with no
divergence/NaN.

Run (CPU only, no TPU needed):
    XLA_FLAGS=--xla_force_host_platform_device_count=2 JAX_PLATFORMS=cpu \
        timeout 7200 python docs/artifacts/fused_sgd_mesh_curves.py
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from pyflyt_tpu.envs.quadx_hover import QuadXHoverEnv  # noqa: E402
from pyflyt_tpu.rl.ppo import PPO, PPOConfig  # noqa: E402

OUT = "/root/repo/docs/artifacts/fused_sgd_mesh_curves_cpu.jsonl"
open(OUT, "w").close()
T0 = time.time()

CFG = PPOConfig(
    num_envs=128, rollout_steps=32, num_epochs=2, num_minibatches=4,
    feature_sizes=(32, 32), learning_rate=3e-4, init_log_std=-0.5,
)
UPDATES = 600
EVAL_EVERY = 10


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:400], flush=True)


def run_arm(arm, seed):
    env = QuadXHoverEnv(max_duration_seconds=2.0, noisy_motors=False)
    if arm == "xla":
        ppo = PPO(env, CFG)
    elif arm == "fused2":
        devs = jax.devices()
        assert len(devs) >= 2, devs
        mesh = Mesh(np.array(devs[:2]), ("env",))
        ppo = PPO(
            env, dataclasses.replace(CFG, fused_sgd=True), mesh=mesh
        )
    else:
        raise ValueError(arm)
    runner = ppo.init(jax.random.PRNGKey(seed))
    if arm == "fused2":
        runner = ppo.shard_runner(runner, ppo.mesh)
    it = jax.jit(ppo.train_iteration)
    curve = []
    for u in range(1, UPDATES + 1):
        runner, m = it(runner)
        if u % EVAL_EVERY == 0:
            curve.append(
                {"update": u, "mean_reward": round(float(m["mean_reward"]), 4),
                 "loss": round(float(m["loss"]), 4),
                 "entropy": round(float(m["entropy"]), 4)}
            )
    params = jax.tree.map(np.asarray, runner.params)
    return curve, params


def pnorm(tree):
    return float(
        np.sqrt(sum(float((l ** 2).sum()) for l in jax.tree.leaves(tree)))
    )


print("devices:", jax.devices(), flush=True)
finals = {}
for seed in (0, 1, 2):
    params_by_arm = {}
    for arm in ("xla", "fused2"):
        curve, params = run_arm(arm, seed)
        params_by_arm[arm] = params
        tail = [c["mean_reward"] for c in curve[-5:]]
        finals[(arm, seed)] = float(np.mean(tail))
        emit({"arm": arm, "seed": seed, "final_reward_tail_mean":
              round(float(np.mean(tail)), 4), "curve": curve})
    drift = pnorm(
        jax.tree.map(
            lambda a, b: a - b, params_by_arm["xla"], params_by_arm["fused2"]
        )
    )
    emit({"seed": seed,
          "param_drift_l2": round(drift, 4),
          "xla_param_l2": round(pnorm(params_by_arm["xla"]), 4)})

x = [finals[("xla", s)] for s in (0, 1, 2)]
f = [finals[("fused2", s)] for s in (0, 1, 2)]
spread = max(x) - min(x)
gap = abs(float(np.mean(x)) - float(np.mean(f)))
emit({"summary": {
    "xla_final_rewards": x, "fused2_final_rewards": f,
    "xla_seed_spread": round(spread, 4), "arm_gap": round(gap, 4),
    "equivalent": bool(gap <= max(2.0 * spread, 0.5)),
}})
print("done", round(time.time() - T0), "s", flush=True)
