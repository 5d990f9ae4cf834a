"""Round-5 conv-learner part B: the rollout-shape lever.

Part A's phase profile overturned the r4 diagnosis: the vision iteration
is NOT conv-SGD-bound — at the r4 recipe (256 envs x 128 rollout) the
iteration is 696 ms of which the ROLLOUT is 651 ms (94%), SGD 46 ms, the
env itself 13 ms. Each of the 128 sequential policy forwards costs ~5 ms
on a 256-row batch while the SAME network forward on 4096 rows costs
6.7 ms — per-call overhead, not compute. The lever is therefore batch
amortization: more envs x shorter rollout at CONSTANT on-policy batch
(32768), which leaves the SGD phase untouched.

  B1 — iteration time for (envs, rollout) in {(256,128), (512,64),
       (1024,32), (2048,16), (4096,8)}, conv impl from part A's winner,
       in-process interleaved.
  B2 — solve check on the best shape: 40M env-steps, bar eval >= +400
       (the r4 all-5-gates band) — shorter rollouts change the GAE
       horizon, so the curve must be revalidated.

Run (holds the TPU):
    timeout 10800 python docs/artifacts/gates_vision_r5b.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

ART = "/root/repo/docs/artifacts"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

from pyflyt_tpu.envs.quadx_gates import QuadXGatesEnv  # noqa: E402
from pyflyt_tpu.rl import PPO, PPOConfig, TrainConfig, train  # noqa: E402
from pyflyt_tpu.rl.networks import VisionActorCritic  # noqa: E402

OUT = f"{ART}/gates_vision_r5b_tpu.jsonl"
open(OUT, "w").close()

RES = 32
ENV = QuadXGatesEnv(camera_resolution=(RES, RES))

# part A's L-stage winner impl (fall back to stock conv if absent)
IMPL = "conv"
try:
    for line in open(f"{ART}/gates_vision_r5_tpu.jsonl"):
        r = json.loads(line)
        if r.get("stage") == "L-best":
            IMPL = r["variant"].split("-")[0]
            if IMPL not in ("conv", "im2col", "s2d"):
                IMPL = "conv"
except FileNotFoundError:
    pass
print("conv impl:", IMPL, flush=True)


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:600], flush=True)


def make_net():
    return VisionActorCritic(
        action_dim=4, image_offset=ENV.combined_size,
        image_shape=(4, RES, RES), conv_features=(16, 32, 32),
        feature_sizes=(128,), init_log_std=-0.5, conv_impl=IMPL,
    )


# (num_envs, rollout_steps, cached_reset_refresh). Part A's L-stage 512env
# regression + the stage-P numbers localize the rollout cost to the
# per-step FULL reset recompute (the r4 recipe never set
# cached_reset_refresh, so autoreset_step re-ran the 10-step stabilization
# reset + render for every env every step) — the cached pool is the
# primary lever, the shape sweep then isolates batch amortization on top.
SHAPES = [(256, 128, 0), (256, 128, 64), (512, 64, 64), (1024, 32, 64),
          (2048, 16, 64), (4096, 8, 64)]
its, runners = {}, {}
for ne, rs, crr in SHAPES:
    cfg = PPOConfig(num_envs=ne, rollout_steps=rs, num_epochs=4,
                    num_minibatches=8, learning_rate=3e-4, clip_eps=0.2,
                    init_log_std=-0.5, cached_reset_refresh=crr)
    p = PPO(ENV, cfg, network=make_net())
    runners[(ne, rs, crr)] = p.init(jax.random.PRNGKey(0))
    its[(ne, rs, crr)] = jax.jit(p.train_iteration)
    out = its[(ne, rs, crr)](runners[(ne, rs, crr)])
    jax.block_until_ready(jax.tree.leaves(out))
    print("compiled", (ne, rs, crr), f"{round(time.time() - T0)}s",
          flush=True)

REPS = 5
acc = {k: [] for k in its}
for _ in range(REPS):
    for k in its:
        t0 = time.perf_counter()
        out = its[k](runners[k])
        jax.block_until_ready(jax.tree.leaves(out))
        acc[k].append(time.perf_counter() - t0)

best_k, best_rate = None, 0.0
for k in its:
    ts = sorted(acc[k])[1:-1]
    dt = sum(ts) / len(ts)
    rate = 32768 / dt
    emit({"stage": "B1", "num_envs": k[0], "rollout_steps": k[1],
          "cached_reset_refresh": k[2],
          "impl": IMPL, "ms_per_iter": round(dt * 1e3, 1),
          "env_steps_per_s": round(rate),
          "spread_ms": round((max(acc[k]) - min(acc[k])) * 1e3, 1)})
    if rate > best_rate:
        best_k, best_rate = k, rate
base_dt = (sum(sorted(acc[(256, 128, 0)])[1:-1])
           / max(len(acc[(256, 128, 0)]) - 2, 1))
emit({"stage": "B1-best", "shape": best_k,
      "env_steps_per_s": round(best_rate),
      "speedup_vs_r4_shape": round(best_rate / (32768 / base_dt), 2)})
del its, runners

# ---- B2: solve check on the best shape --------------------------------------
ne, rs, crr = best_k
cfg = PPOConfig(num_envs=ne, rollout_steps=rs, num_epochs=4,
                num_minibatches=8, learning_rate=3e-4, clip_eps=0.2,
                init_log_std=-0.5, cached_reset_refresh=crr)
ppo = PPO(ENV, cfg, network=make_net())
rows = []


def on_metrics(u, row):
    rows.append(row)
    if len(rows) % 4 == 1:
        print(json.dumps({k: round(v, 2) for k, v in row.items()
                          if k in ("update", "env_steps", "steps_per_s",
                                   "mean_reward", "eval_mean_reward")}),
              flush=True)


t0 = time.time()
train(ppo, TrainConfig(total_timesteps=40_000_000,
                       eval_every_updates=max(40 * 128 // rs // 8, 10),
                       eval_episodes=8, seed=0), on_metrics=on_metrics)
best_eval = max((r["eval_mean_reward"] for r in rows), default=None)
emit({"stage": "B2", "shape": best_k, "impl": IMPL,
      "train_wall_s": round(time.time() - t0),
      "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
      "best_eval": best_eval,
      "solve_intact": bool(best_eval is not None and best_eval >= 400.0),
      "rows": rows[::4] + rows[-1:]})
print("done", round(time.time() - T0), "s", flush=True)
