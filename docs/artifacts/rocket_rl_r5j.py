"""Round-5 rocket-landing RL, part J: grind the 150 m rung to a crossing.

Parts H/I banked archived landing policies at 13 m (soft 1.95% /
complete 1.56%) and 40 m (1.56% each); the 150 m rung reached med 4.98 /
p10 1.92 m/s in 1.2B without crossing. Part J spends the remaining
budget on that single rung, warm-started from the archived L2 params,
checkpointing the best on every improvement so a timeout or tunnel hang
banks the progress.

Parts E/F crossed the soft/complete landing threshold at the 13 m and
40 m rungs, but their archived checkpoints are each run's FINAL-stage
best (the full-height attempt), not the rung-crossing policies — the
landing evidence lived only in eval rows. Part H reruns the two rungs
(deterministic on-chip: part F retraced part E digit-for-digit) and
archives each rung's best params + a 256-episode tier eval of exactly
those params.

Run (holds the TPU):
    timeout 7200 python docs/artifacts/rocket_rl_r5h.py
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
from pyflyt_tpu.envs.rocket_landing import RocketLandingEnv  # noqa: E402
from pyflyt_tpu.rl import PPO, PPOConfig, checkpoint  # noqa: E402

OUT = f"{ART}/rocket_rl_r5j_tpu.jsonl"
open(OUT, "w").close()

FUEL = 0.02


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:600], flush=True)


@dataclasses.dataclass(frozen=True)
class LandingObjectiveEnv(RocketLandingEnv):
    """Part-E training reward (see rocket_rl_r5e.py)."""

    decel_k: float = 5.0
    loiter_neutralize: float = 5.0
    touch_bonus: float = 200.0
    touch_speed_k: float = 40.0
    touch_omega_bonus: float = 100.0
    touch_omega_k: float = 50.0

    def _task_update(self, state, ground_contact, pad_contact):
        prev_flag = state.pad_contact_flag
        state = super()._task_update(state, ground_contact, pad_contact)
        speed_prev = jnp.linalg.norm(state.prev_lin_vel, axis=-1)
        speed = jnp.linalg.norm(state.lin_vel, axis=-1)
        first_touch = (state.pad_contact_flag > 0.5) & (prev_flag < 0.5)
        r = (
            state.reward
            + self.loiter_neutralize
            + self.decel_k * (speed_prev - speed)
            + jnp.where(
                first_touch,
                self.touch_bonus
                - self.touch_speed_k * jnp.minimum(speed_prev, 5.0),
                0.0,
            )
            + jnp.where(
                first_touch,
                self.touch_omega_bonus
                - self.touch_omega_k * jnp.minimum(
                    jnp.linalg.norm(state.prev_ang_vel, axis=-1), 2.0),
                0.0,
            )
        )
        return state.replace(reward=r)


CFG = PPOConfig(num_envs=8192, rollout_steps=128, num_epochs=4,
                num_minibatches=32, learning_rate=3e-4, clip_eps=0.2,
                init_log_std=-1.2, log_std_range=(-3.5, -1.0),
                cached_reset_refresh=64)

RUNGS = [
    ("L2x", dict(ceiling=150.0, max_displacement=100.0,
                 accelerate_drop=False), 2_200_000_000),
]


def make_landing_eval(ppo, eval_env, n):
    @jax.jit
    def run(params, keys):
        st, obs = vec_reset(eval_env, keys)

        def body(carry, _):
            st, obs, done, complete, pad, fatal, ep_rew, tspeed = carry
            a = ppo.act_deterministic(params, obs)
            st2, out = jax.vmap(eval_env.step)(st, a)
            live = ~done
            complete = complete | (out.info["env_complete"] & live)
            padn = (st2.pad_contact_flag > 0.5) & live
            tspeed = jnp.where(
                padn & ~pad, jnp.linalg.norm(st2.prev_lin_vel, axis=-1),
                tspeed,
            )
            pad = pad | padn
            fatal = fatal | (out.info["fatal_collision"] & live)
            ep_rew = ep_rew + out.reward * live
            done = done | out.termination | out.truncation
            return (st2, out.obs, done, complete, pad, fatal, ep_rew,
                    tspeed), None

        z = jnp.zeros(n, bool)
        init = (st, obs, z, z, z, z, jnp.zeros(n), jnp.full(n, -1.0))
        (st, obs, done, complete, pad, fatal, ep_rew, tspeed), _ = (
            jax.lax.scan(body, init, None, length=eval_env.max_steps + 2)
        )
        return complete, pad, fatal, ep_rew, tspeed

    def landing_eval(params, key):
        keys = jax.random.split(key, n)
        complete, pad, fatal, ep_rew, tspeed = run(params, keys)
        pad_np = np.asarray(pad)
        fatal_np = np.asarray(fatal)
        ts = np.asarray(tspeed)
        ts_pad = ts[pad_np] if pad_np.any() else np.asarray([-1.0])
        return {
            "episodes": n,
            "pad_rate": float(pad_np.mean()),
            "soft_rate": float((pad_np & ~fatal_np).mean()),
            "complete_rate": float(np.asarray(complete).mean()),
            "fatal_rate": float(fatal_np.mean()),
            "mean_ep_reward": float(np.asarray(ep_rew).mean()),
            "touchdown_speed_med": float(np.median(ts_pad)),
            "touchdown_speed_p10": float(np.percentile(ts_pad, 10)),
        }

    return landing_eval


def score(le):
    med = le["touchdown_speed_med"]
    med = med if (le["pad_rate"] > 0 and med >= 0) else 1e9
    return (le["complete_rate"], le["soft_rate"], -med, le["pad_rate"])


# warm-start from the archived L1 rung policy (part H)
_tmp_env = LandingObjectiveEnv(starting_fuel_ratio=FUEL, ceiling=150.0)
_tmp_ppo = PPO(_tmp_env, CFG)
_template = _tmp_ppo.init(jax.random.PRNGKey(0))
params = jax.tree.map(np.asarray, checkpoint.restore_params(
    (f"{ART}/policies_rocket_landing_L2x_r5j"
     if __import__("os").path.isdir(f"{ART}/policies_rocket_landing_L2x_r5j")
     else f"{ART}/policies_rocket_landing_L2_r5i"), _template.params
))
del _tmp_env, _tmp_ppo, _template

for rung, env_kw, budget in RUNGS:
    train_env = LandingObjectiveEnv(starting_fuel_ratio=FUEL, **env_kw)
    eval_env = RocketLandingEnv(starting_fuel_ratio=FUEL, **env_kw)
    ppo = PPO(train_env, CFG)
    it = jax.jit(ppo.train_iteration)
    ev = make_landing_eval(ppo, eval_env, 64)
    runner = ppo.init(jax.random.PRNGKey(1))
    if params is not None:
        carried = jax.tree.map(jnp.asarray, params)
        carried = dict(carried, params=dict(
            carried["params"],
            log_std=jnp.full_like(
                carried["params"]["log_std"], CFG.init_log_std
            ),
        ))
        runner = runner.replace(params=carried)
    updates = budget // CFG.batch_size
    best = None
    best_params = None
    t0 = time.time()
    for u in range(1, updates + 1):
        runner, m = it(runner)
        if u % 50 == 0 or u == updates:
            le = ev(runner.params,
                    jax.random.fold_in(jax.random.PRNGKey(11), u))
            if best is None or score(le) > best:
                best = score(le)
                best_params = jax.tree.map(np.asarray, runner.params)
                checkpoint.save(
                    f"{ART}/policies_rocket_landing_{rung}_r5j",
                    {"params": best_params},
                )
            print(rung, json.dumps({k: (round(v, 3) if isinstance(v, float)
                                        else v) for k, v in le.items()}),
                  "u", u, flush=True)
    # archive THIS rung's best + its own 256-episode eval
    ev256 = make_landing_eval(ppo, eval_env, 256)
    bp = jax.tree.map(jnp.asarray, best_params)
    final = ev256(bp, jax.random.PRNGKey(999))
    ckpt = f"{ART}/policies_rocket_landing_{rung}_r5j"
    checkpoint.save(ckpt, {"params": best_params})
    emit({"stage": rung, "env": env_kw, "fuel": FUEL,
          "train_wall_s": round(time.time() - t0),
          "eval_256_of_archived_params": final, "ckpt": ckpt})
    params = best_params
    del ppo, it, runner
print("done", round(time.time() - T0), "s", flush=True)
