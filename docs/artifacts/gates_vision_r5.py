"""Round-5 conv-learner campaign (VERDICT r4 next-round #4).

Round 4 closed vision RL (QuadX-Gates 32x32 FPV solved on chip) but the
trainer ran at ~47.5K env-steps/s vs 650K pure-env — conv-SGD-bound, with
no optimization pass. This applies the r4 MLP-campaign discipline to the
conv learner:

  P — phase profile of the r4 recipe's iteration (rollout vs SGD; conv
      fwd vs fwd+bwd at minibatch shape) + a stated conv roofline.
  L — levers, in-process interleaved A/B of the FULL train iteration
      (per-process tunnel variance swamps cross-process numbers —
      CLAUDE.md measurement discipline):
        L1 conv lowering: conv | im2col | s2d (exact reformulations,
           rl/networks._StridedConv; parity-tested on CPU)
        L2 bfloat16 compute (params/grads/Adam stay f32)
        L3 minibatch count 8 -> 4 -> 2 (same epochs: bigger matmul M)
        L4 512 envs (does the recipe scale past 256?)
  S — solve check: train the best combo ~40M env-steps, require the
      r4-band eval (>= +400 ~ 4-5 gates) to keep the curve intact.

Run (holds the TPU):
    timeout 10800 python docs/artifacts/gates_vision_r5.py
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ART = "/root/repo/docs/artifacts"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

from pyflyt_tpu.envs.base import vec_reset  # noqa: E402
from pyflyt_tpu.envs.quadx_gates import QuadXGatesEnv  # noqa: E402
from pyflyt_tpu.rl import PPO, PPOConfig, TrainConfig, train  # noqa: E402
from pyflyt_tpu.rl.networks import VisionActorCritic  # noqa: E402

OUT = f"{ART}/gates_vision_r5_tpu.jsonl"
open(OUT, "w").close()

RES = 32
ENV = QuadXGatesEnv(camera_resolution=(RES, RES))
CFG = PPOConfig(num_envs=256, rollout_steps=128, num_epochs=4,
                num_minibatches=8, learning_rate=3e-4, clip_eps=0.2,
                init_log_std=-0.5)


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:600], flush=True)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.perf_counter() - t0) / reps


def make_net(conv_impl="conv", dtype="float32"):
    return VisionActorCritic(
        action_dim=4, image_offset=ENV.combined_size,
        image_shape=(4, RES, RES), conv_features=(16, 32, 32),
        feature_sizes=(128,), init_log_std=-0.5,
        conv_impl=conv_impl, dtype=jnp.dtype(dtype),
    )


def conv_flops_per_sample():
    """fwd MACs*2 of the conv stack + dense trunks at 32x32."""
    f = 0
    h, c = RES, 4
    for feat in (16, 32, 32):
        h = -(-h // 2)
        f += h * h * feat * 9 * c * 2
        c = feat
    flat = h * h * c  # 4*4*32 = 512
    vec = ENV.combined_size + 3 * ENV.num_targets - 0  # approx vector dims
    for a, b in ((flat + vec, 128), (128, 4), (flat + vec, 128), (128, 1)):
        f += a * b * 2
    return f


FLOPS_FWD = conv_flops_per_sample()

# ---- stage P: phase profile -------------------------------------------------
ppo = PPO(ENV, CFG, network=make_net())
runner = ppo.init(jax.random.PRNGKey(0))
it = jax.jit(ppo.train_iteration)
roll = jax.jit(ppo._rollout)

dt_it = timeit(it, runner)
dt_roll = timeit(roll, runner)

# pure env chunk (no policy) at 256 envs
keys = jax.random.split(jax.random.PRNGKey(0), 256)
st0, _ = vec_reset(ENV, keys)
act = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.5]), (256, 1))


@jax.jit
def env_chunk(s):
    def body(s, _):
        s, out = jax.vmap(ENV.step)(s, act)
        return s, out.reward
    return jax.lax.scan(body, s, None, length=128)


dt_env = timeit(env_chunk, st0)

# minibatch-shaped fwd and fwd+bwd
mb = CFG.batch_size // CFG.num_minibatches
obs_dim = int(np.prod(jax.tree.leaves(runner.obs)[0].shape[1:])) \
    if isinstance(runner.obs, dict) else runner.obs.shape[-1]
from pyflyt_tpu.rl.ppo import _flat_obs  # noqa: E402

flat0 = _flat_obs(runner.obs)
obs_mb = jnp.tile(flat0, (mb // flat0.shape[0] + 1, 1))[:mb]


@jax.jit
def fwd(params, o):
    m, s, v = ppo.network.apply(params, o)
    return m.sum() + v.sum()


fwd_bwd = jax.jit(jax.grad(fwd))
dt_fwd = timeit(fwd, runner.params, obs_mb)
dt_bwd = timeit(fwd_bwd, runner.params, obs_mb)

sgd_ms = (dt_it - dt_roll) * 1e3
n_mb_total = CFG.num_epochs * CFG.num_minibatches
emit({"stage": "P", "recipe": "r4 (256envs x 128, 4ep x 8mb)",
      "ms_iteration": round(dt_it * 1e3, 1),
      "ms_rollout": round(dt_roll * 1e3, 1),
      "ms_env_only_128steps": round(dt_env * 1e3, 1),
      "ms_sgd_phase": round(sgd_ms, 1),
      "ms_fwd_mb4096": round(dt_fwd * 1e3, 2),
      "ms_fwdbwd_mb4096": round(dt_bwd * 1e3, 2),
      "flops_fwd_per_sample": FLOPS_FWD,
      "implied_sgd_mfu_pct": round(
          100 * 3 * FLOPS_FWD * mb * n_mb_total / (sgd_ms / 1e3) / 197e12, 2),
      "env_steps_per_s_iteration": round(CFG.batch_size / dt_it)})
del ppo, runner, it, roll

# ---- stage L: levers (in-process interleaved) --------------------------------
VARIANTS = {
    "base-conv-f32": dict(conv_impl="conv", dtype="float32", cfg=CFG),
    "im2col-f32": dict(conv_impl="im2col", dtype="float32", cfg=CFG),
    "s2d-f32": dict(conv_impl="s2d", dtype="float32", cfg=CFG),
    "s2d-bf16": dict(conv_impl="s2d", dtype="bfloat16", cfg=CFG),
    "conv-bf16": dict(conv_impl="conv", dtype="bfloat16", cfg=CFG),
    "s2d-f32-mb4": dict(conv_impl="s2d", dtype="float32",
                        cfg=dataclasses.replace(CFG, num_minibatches=4)),
    "s2d-f32-mb2": dict(conv_impl="s2d", dtype="float32",
                        cfg=dataclasses.replace(CFG, num_minibatches=2)),
    "s2d-f32-512env": dict(conv_impl="s2d", dtype="float32",
                           cfg=dataclasses.replace(CFG, num_envs=512)),
}

its = {}
runners = {}
for tag, v in VARIANTS.items():
    p = PPO(ENV, v["cfg"], network=make_net(v["conv_impl"], v["dtype"]))
    runners[tag] = p.init(jax.random.PRNGKey(0))
    its[tag] = (jax.jit(p.train_iteration), v["cfg"].batch_size)
    # warmup/compile
    out = its[tag][0](runners[tag])
    jax.block_until_ready(jax.tree.leaves(out))
    print("compiled", tag, f"{round(time.time() - T0)}s", flush=True)

REPS = 6
acc = {tag: [] for tag in VARIANTS}
for _ in range(REPS):
    for tag in VARIANTS:
        fn, bs = its[tag]
        t0 = time.perf_counter()
        out = fn(runners[tag])
        jax.block_until_ready(jax.tree.leaves(out))
        acc[tag].append(time.perf_counter() - t0)

for tag in VARIANTS:
    ts = sorted(acc[tag])[1:-1]  # trim outliers
    dt = sum(ts) / len(ts)
    bs = its[tag][1]
    emit({"stage": "L", "variant": tag, "ms_per_iter": round(dt * 1e3, 1),
          "env_steps_per_s": round(bs / dt),
          "spread_ms": round((max(acc[tag]) - min(acc[tag])) * 1e3, 1)})

best = max(VARIANTS, key=lambda t: its[t][1] / (sum(sorted(acc[t])[1:-1]) /
                                                max(len(acc[t]) - 2, 1)))
emit({"stage": "L-best", "variant": best})
del its, runners

# ---- stage S: solve check with the best variant ------------------------------
v = VARIANTS[best]
ppo = PPO(ENV, v["cfg"], network=make_net(v["conv_impl"], v["dtype"]))
rows = []


def on_metrics(u, row):
    rows.append(row)
    if len(rows) % 4 == 1:
        print(json.dumps({k: round(val, 2) for k, val in row.items()
                          if k in ("update", "env_steps", "steps_per_s",
                                   "mean_reward", "eval_mean_reward")}),
              flush=True)


t0 = time.time()
train(ppo, TrainConfig(total_timesteps=40_000_000, eval_every_updates=40,
                       eval_episodes=8, seed=0), on_metrics=on_metrics)
best_eval = max((r["eval_mean_reward"] for r in rows), default=None)
emit({"stage": "S", "variant": best,
      "train_wall_s": round(time.time() - t0),
      "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
      "best_eval": best_eval,
      "solve_intact": bool(best_eval is not None and best_eval >= 400.0),
      "rows": rows[::4] + rows[-1:]})
print("done", round(time.time() - T0), "s", flush=True)
