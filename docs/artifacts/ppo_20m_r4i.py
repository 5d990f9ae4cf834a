"""Round-4 PPO >=20M part I: surgical SGD-phase split at the 64K config.

Part H: slot-bootstrap rollout + 3ep x 512mb at 65536 envs = 19.92M
env-steps/s — 0.4% under the bar, inside run-to-run variance. Before any
more blind levers: split the 312.8 ms SGD phase into its parts at this
exact shape and re-time the winners with more reps.

  A — tight (reps=10) re-time of the 64K iteration + a 98304-env point.
  B — SGD-phase anatomy at (65536, 3ep, 512mb), each timed alone:
        shuffle    — the per-epoch block-permutation gather
        fwdbwd     — scan of value_and_grad over the 512 minibatches (no
                     optimizer)
        optimizer  — scan of optimizer.update+apply_updates on frozen
                     grads (512 steps)
        epoch      — the real epoch (shuffle + fwdbwd + opt)

Run (holds the TPU):
    timeout 7200 python docs/artifacts/ppo_20m_r4i.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

ART = "/root/repo/docs/artifacts"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

from pyflyt_tpu.envs.quadx_mod.packed_hovering import (  # noqa: E402
    PackedQuadXModHoveringEnv,
)
from pyflyt_tpu.rl import PPO, PPOConfig  # noqa: E402

OUT = f"{ART}/ppo_20m_r4i_tpu.jsonl"
open(OUT, "w").close()

ENV_KW = dict(flight_mode=9, orn_conv="NED_FRD", control_hz=80,
              simulate_wind=True)


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:400], flush=True)


def timeit(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], ts[0], ts[-1]


def mk(num_envs, mbs):
    return PPOConfig(num_envs=num_envs, rollout_steps=128, num_epochs=3,
                     num_minibatches=mbs, learning_rate=2e-4, clip_eps=0.1,
                     init_log_std=-1.6)


# ---- stage A: tight timings -------------------------------------------------
for num_envs, mbs in ((65536, 512), (98304, 768)):
    cfg = mk(num_envs, mbs)
    try:
        ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
        runner = ppo.init(jax.random.PRNGKey(0))
        it = jax.jit(ppo.train_iteration)
        med, lo, hi = timeit(it, runner)
        med_r, _, _ = timeit(jax.jit(ppo._rollout), runner, reps=5)
        emit({"stage": "A", "num_envs": num_envs, "minibatches": mbs,
              "ms_per_iter_median": round(med * 1e3, 2),
              "ms_iter_min": round(lo * 1e3, 2),
              "ms_iter_max": round(hi * 1e3, 2),
              "ms_rollout": round(med_r * 1e3, 2),
              "env_steps_per_s_median": round(cfg.batch_size / med),
              "env_steps_per_s_best": round(cfg.batch_size / lo)})
        if num_envs != 65536:
            del runner, ppo
    except Exception as e:
        emit({"stage": "A", "num_envs": num_envs, "error": repr(e)[:300]})

# ---- stage B: SGD-phase anatomy at (65536, 512) ----------------------------
cfg = mk(65536, 512)
ppo = PPO(PackedQuadXModHoveringEnv.create(**ENV_KW), cfg)
runner = ppo.init(jax.random.PRNGKey(0))
runner, traj = jax.jit(ppo._rollout)(runner)
adv, ret = jax.jit(ppo._gae)(runner.params, traj, runner.obs)
jax.block_until_ready(adv)

obs_dim = runner.obs.shape[-1]
act_dim = traj.action.shape[-1]
feat = obs_dim + act_dim + 3
n = cfg.batch_size
packed = jnp.concatenate([
    traj.obs.reshape(n, obs_dim),
    traj.action.reshape(n, act_dim),
    traj.log_prob.reshape(n, 1),
    adv.reshape(n, 1),
    ret.reshape(n, 1),
], axis=1)

target = max(int(cfg.shuffle_block), cfg.batch_size // 8192)
blk = max(d for d in range(1, target + 1) if cfg.minibatch_size % d == 0)
num_blocks = cfg.batch_size // blk


@jax.jit
def shuffle(packed, key):
    perm = jax.random.permutation(key, num_blocks)
    return packed.reshape((num_blocks, blk, feat))[perm].reshape(
        (cfg.num_minibatches, cfg.minibatch_size, feat))


mbs_arr = shuffle(packed, jax.random.PRNGKey(1))
jax.block_until_ready(mbs_arr)
med, _, _ = timeit(shuffle, packed, jax.random.PRNGKey(2), reps=5)
emit({"stage": "B", "part": "shuffle(x1 epoch)", "ms": round(med * 1e3, 2)})


def loss_of(params, mb):
    return ppo._loss(
        params,
        mb[:, :obs_dim],
        mb[:, obs_dim:obs_dim + act_dim],
        mb[:, obs_dim + act_dim],
        mb[:, obs_dim + act_dim + 1],
        mb[:, obs_dim + act_dim + 2],
    )


@jax.jit
def fwdbwd(params, mbs_arr):
    def step(carry, mb):
        (_, _), grads = jax.value_and_grad(loss_of, has_aux=True)(carry, mb)
        # consume grads into the carry cheaply so nothing is DCE'd but no
        # optimizer runs (scaled by 0 keeps params bit-identical)
        carry = jax.tree.map(lambda p, g: p + 0.0 * g, carry, grads)
        return carry, ()
    out, _ = jax.lax.scan(step, params, mbs_arr)
    return out


med, _, _ = timeit(fwdbwd, runner.params, mbs_arr, reps=5)
emit({"stage": "B", "part": "fwd+bwd scan (x1 epoch)", "ms": round(med * 1e3, 2)})

one_grads = jax.jit(
    lambda p, mb: jax.value_and_grad(loss_of, has_aux=True)(p, mb)[1]
)(runner.params, mbs_arr[0])
jax.block_until_ready(jax.tree.leaves(one_grads))


@jax.jit
def opt_only(params, opt_state, grads):
    def step(carry, _):
        params, opt_state = carry
        updates, opt_state = ppo.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), ()
    (params, opt_state), _ = jax.lax.scan(
        step, (params, opt_state), None, length=cfg.num_minibatches)
    return params


med, _, _ = timeit(opt_only, runner.params, runner.opt_state, one_grads,
                   reps=5)
emit({"stage": "B", "part": "optimizer scan (x1 epoch)", "ms": round(med * 1e3, 2)})

print("PPO-20M-I DONE in", round(time.time() - T0), "s", flush=True)
