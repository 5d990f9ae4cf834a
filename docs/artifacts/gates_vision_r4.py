"""Round-4 vision RL: PPO with a conv policy on QuadX-Gates, on-chip.

The reference's vision env crashes upstream (quadx_gates_env.py:93-94 bad
asset path), so there is no reference training recipe — this demonstrates
the capability the reference intended: FPV-camera flight through race
gates, rendered AND trained entirely on the TPU (ray-cast camera in the
env step, VisionActorCritic conv policy in the learner).

  A — throughput: env stepping at 32x32 rays (256/512 envs) and the full
      vision train iteration.
  B — training: 256 envs x 128 rollout, 4 epochs x 8 minibatches,
      ~150M env-steps. Success = eval_mean_reward rising from the -100s
      (instant crash) to >= 0 (i.e. >= ~1-2 gates passed per episode,
      at +100 per gate, -0.1 per step, -100 crash).

Run (holds the TPU):
    timeout 7200 python docs/artifacts/gates_vision_r4.py
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

from pyflyt_tpu.envs.base import vec_reset  # noqa: E402
from pyflyt_tpu.envs.quadx_gates import QuadXGatesEnv  # noqa: E402
from pyflyt_tpu.rl import PPO, PPOConfig, TrainConfig, train  # noqa: E402
from pyflyt_tpu.rl.networks import VisionActorCritic  # noqa: E402

OUT = f"{ART}/gates_vision_r4_tpu.jsonl"
open(OUT, "w").close()

RES = 32


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:500], flush=True)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.perf_counter() - t0) / reps


env = QuadXGatesEnv(camera_resolution=(RES, RES))

# ---- stage A: throughput ----------------------------------------------------
for n in (256, 512):
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    st, _ = vec_reset(env, keys)
    act = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.5]), (n, 1))

    @jax.jit
    def chunk(s):
        def body(s, _):
            s, out = jax.vmap(env.step)(s, act)  # noqa: B023
            return s, out.reward
        return jax.lax.scan(body, s, None, length=64)

    dt = timeit(chunk, st)
    emit({"stage": "A-env", "num_envs": n, "res": RES,
          "env_steps_per_s": round(n * 64 / dt)})
    del st, chunk

CFG = PPOConfig(num_envs=256, rollout_steps=128, num_epochs=4,
                num_minibatches=8, learning_rate=3e-4, clip_eps=0.2,
                init_log_std=-0.5)
NET = VisionActorCritic(
    action_dim=4, image_offset=env.combined_size,
    image_shape=(4, RES, RES), conv_features=(16, 32, 32),
    feature_sizes=(128,), init_log_std=-0.5,
)
ppo = PPO(env, CFG, network=NET)
runner = ppo.init(jax.random.PRNGKey(0))
it = jax.jit(ppo.train_iteration)
dt = timeit(it, runner)
emit({"stage": "A-train", "num_envs": 256, "res": RES,
      "ms_per_iter": round(dt * 1e3, 1),
      "env_steps_per_s": round(CFG.batch_size / dt)})
del runner, ppo, it

# ---- stage B: training ------------------------------------------------------
ppo = PPO(env, CFG, network=NET)
rows = []


def on_metrics(u, row):
    rows.append(row)
    if len(rows) % 4 == 1:
        print(json.dumps(
            {k: round(v, 2) for k, v in row.items()
             if k in ("update", "env_steps", "steps_per_s", "entropy",
                      "mean_reward", "eval_mean_reward",
                      "eval_mean_length")}), flush=True)


t0 = time.time()
train(ppo, TrainConfig(
    total_timesteps=150_000_000, eval_every_updates=40, eval_episodes=8,
    seed=0,
), on_metrics=on_metrics)
best = max((r["eval_mean_reward"] for r in rows), default=None)
emit({"stage": "B", "recipe": {"num_envs": 256, "epochs": 4,
                               "minibatches": 8, "lr": 3e-4, "res": RES},
      "train_wall_s": round(time.time() - t0),
      "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
      "best_eval": best,
      "first_eval": rows[0]["eval_mean_reward"] if rows else None,
      "rows": rows[::4] + rows[-1:]})
print("done", round(time.time() - T0), "s", flush=True)
