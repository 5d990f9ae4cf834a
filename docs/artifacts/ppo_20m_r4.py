"""Round-4 PPO >=20M recipe: the reference's trajectory-net architecture.

ppo_fast_recipe_r4_tpu.jsonl showed the epochs cut (10 -> 3) reaches 16-20M
but does NOT reproduce the mode-9 solve within 3B steps (both lr 1e-4 and
2e-4, 2 seeds each) -- cutting sample reuse changes the learning dynamics.
The compute view explains the wall: with the (256,256) hovering trunk,
10 epochs x fwd+bwd is ~8.4 MFLOP per env-step, so 20M env-steps/s is at
v5e MXU peak. The honest path to >=20M with UNCHANGED learning dynamics
(10 epochs x 64 minibatches, lr 1e-4, clip 0.1, init_log_std -1.6) is the
reference's own trajectory-task architecture -- net_arch pi/vf
[64, 64, 32, 32] with its feature extractor commented out
(/root/reference/PyFlyt/rl_training/trajectory_following_fast/
training.py:112-122) -- which round 3's curriculum already showed solves
mod-hovering mode 9 (the H stage of traj_slow_curriculum_tpu.jsonl). That
net is 8x cheaper per sample.

Stage A: rollout micro-breakdown + iteration measurements (XLA epoch vs
fused kernel at several chunk sizes, both nets).
Stage B: 2-seed mode-9 curves with the chosen >=20M config; bar = eval
mean reward >= 24000 (30/35 per step over the 800-step horizon).

Run (holds the TPU):
    timeout 7200 python docs/artifacts/ppo_20m_r4.py
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

from pyflyt_tpu.envs.quadx_mod.packed_hovering import (  # noqa: E402
    PackedQuadXModHoveringEnv,
)
from pyflyt_tpu.rl import PPO, PPOConfig, TrainConfig, train  # noqa: E402

OUT = f"{ART}/ppo_20m_r4_tpu.jsonl"
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
SMALL = dict(feature_sizes=(), pi_sizes=(64, 64, 32, 32),
             vf_sizes=(64, 64, 32, 32))
BIG = dict(feature_sizes=(256, 256))


def recipe(num_envs, epochs, net, **kw):
    return PPOConfig(
        num_envs=num_envs, rollout_steps=128, num_epochs=epochs,
        num_minibatches=64, learning_rate=1e-4, clip_eps=0.1,
        init_log_std=-1.6, **net, **kw,
    )


# ---- stage A0: rollout micro-breakdown @ 8192, small net -------------------
cfg0 = recipe(8192, 10, SMALL)
ppo0 = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg0)
runner0 = ppo0.init(jax.random.PRNGKey(0))
act_fixed = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.1]), (8192, 1))


@jax.jit
def env_only(env_state):
    def body(s, _):
        s, out = ppo0.env.autoreset_step(s, act_fixed)
        return s, out.reward
    return jax.lax.scan(body, env_state, None, length=128)


@jax.jit
def act_only(params, obs, key):
    def body(carry, _):
        obs, key = carry
        key, k = jax.random.split(key)
        action, log_prob, value = ppo0.act(params, obs, k)
        return (obs + 0.0 * log_prob[:, None], key), action
    return jax.lax.scan(body, (obs, key), None, length=128)


dt_env = timeit(env_only, runner0.env_state)
dt_act = timeit(act_only, runner0.params, runner0.obs,
                jax.random.PRNGKey(1))
dt_roll = timeit(jax.jit(ppo0._rollout), runner0)
emit({"stage": "A0", "net": "small", "num_envs": 8192,
      "ms_env_only_128": round(dt_env * 1e3, 2),
      "ms_act_only_128": round(dt_act * 1e3, 2),
      "ms_full_rollout_128": round(dt_roll * 1e3, 2)})
del runner0

# ---- stage A: iteration configs --------------------------------------------
results = []
for label, num_envs, epochs, net, fused, chunk in (
    ("small-xla", 8192, 10, SMALL, False, 0),
    ("small-fused-1024", 8192, 10, SMALL, True, 1024),
    ("small-fused-4096", 8192, 10, SMALL, True, 4096),
    ("small-fused-4096-16k", 16384, 10, SMALL, True, 4096),
    ("big-xla", 8192, 10, BIG, False, 0),
    ("big-fused-4096", 8192, 10, BIG, True, 4096),
):
    kw = dict(fused_sgd=fused)
    if fused:
        kw["fused_sgd_chunk"] = chunk
    cfg = recipe(num_envs, epochs, net, **kw)
    try:
        ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
        runner = ppo.init(jax.random.PRNGKey(0))
        it = jax.jit(ppo.train_iteration)
        dt = timeit(it, runner)
        dt_roll = timeit(jax.jit(ppo._rollout), runner)
        del runner
        row = {"stage": "A", "label": label, "num_envs": num_envs,
               "epochs": epochs, "ms_per_iter": round(dt * 1e3, 2),
               "ms_rollout": round(dt_roll * 1e3, 2),
               "env_steps_per_s": round(cfg.batch_size / dt),
               "cfg": {"fused": fused, "chunk": chunk}}
        results.append(row)
        emit(row)
    except Exception as e:
        emit({"stage": "A", "label": label, "error": repr(e)[:300]})

# ---- stage B: 2-seed curves on the best small-net config >= 20M ------------
BAR = 24_000.0
small = [r for r in results if r["label"].startswith("small")]
small.sort(key=lambda r: -r["env_steps_per_s"])
if not small:
    print("no small-net config measured; aborting stage B", flush=True)
    sys.exit(1)
pick = small[0]
emit({"stage": "pick", "label": pick["label"],
      "env_steps_per_s": pick["env_steps_per_s"]})

kw = dict(fused_sgd=pick["cfg"]["fused"])
if pick["cfg"]["fused"]:
    kw["fused_sgd_chunk"] = pick["cfg"]["chunk"]
for seed in (0, 1):
    cfg = recipe(pick["num_envs"], 10, SMALL, **kw)
    ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
    rows = []

    def on_metrics(u, row):
        rows.append(row)
        print(f"s{seed}", json.dumps(
            {k: round(v, 1) for k, v in row.items()
             if k in ("update", "env_steps", "steps_per_s",
                      "eval_mean_reward", "eval_mean_length")}), flush=True)

    t0 = time.time()
    train(ppo, TrainConfig(
        total_timesteps=3_000_000_000, eval_every_updates=40,
        eval_episodes=16, seed=seed,
    ), on_metrics=on_metrics)
    solved = [r for r in rows if r["eval_mean_reward"] >= BAR]
    emit({"stage": "B", "label": pick["label"], "seed": seed,
          "recipe": {"num_envs": pick["num_envs"], "epochs": 10,
                     "minibatches": 64, "lr": 1e-4,
                     "net": "pi/vf [64,64,32,32] (ref traj arch)"},
          "train_wall_s": round(time.time() - t0),
          "steps_per_s": rows[-1]["steps_per_s"] if rows else None,
          "solved_at_env_steps": solved[0]["env_steps"] if solved else None,
          "best_eval": max((r["eval_mean_reward"] for r in rows),
                           default=None),
          "rows": rows[::4] + rows[-1:]})

print("PPO-20M DONE in", round(time.time() - T0), "s", flush=True)
