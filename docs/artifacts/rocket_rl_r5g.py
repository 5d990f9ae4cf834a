"""Round-5 rocket-landing RL, part G: mixed-height spawns, no ladder.

Parts C-F establish: the landing skill is learnable at any FIXED rung
(L0 13 m: soft 3-5%, complete 1.6-3%; L1 40 m: soft 3.1%) but STAGED
transfer forgets — each height jump re-learns burn timing from scratch
and the full-height rungs (L2b/L3) never re-cross the soft threshold
within their budgets. Part G removes the ladder: ONE env whose spawn
height is uniform over [12, 400] m (and xy offset scaled with height),
so every on-policy batch carries the whole difficulty spectrum — the
easy spawns keep the landing-bonus gradient alive while the tall spawns
learn timing against the same value function. Final evals remain the
stock full-height geometry (plus the -100 m/s accelerated entry in a
second phase).

(Inherited part-F/E headers follow.)

Part E CROSSED the landing threshold: L0 (13 m drops) reached soft 4.7% /
complete 3.1% (touchdown p10 0.60 m/s, mean_ep_reward +910) at ~0.7B of
its 1.0B budget — the first sampled survival snowballs through the value
function, exactly as hypothesized. But its shortened ladder (L0 -> 40 ->
500-gentle) could not transfer braking to full height (L2b stuck at
40 m/s; part C's 150 m rung got 29 m/s). Part F: part-E reward/sigma
mechanics + the FULL rung ladder + per-stage early exit once soft-rate
establishes (>= 0.25 after a quarter of the budget), so the budget flows
to the rungs that still need it.

(Inherited part-E header follows.)

Part D's L0 (13 m gentle drop, sigma clamp) converged to touchdown
median 3.1 m/s / p10 1.057 — a hair over the 1.0 m/s soft threshold,
still improving when its 0.25B budget ended, with fatal_rate 1.0 (the
policy has never SAMPLED a survival, so the +500-complete value signal
never fires). Changes: (a) L0 budget 1.0B — let the snowball fire at the
easiest stage; (b) the fatal check is |v|>1.0 OR |omega|>0.35
(rocket_landing.py:138-140) and part D shaped only speed — touchdown
ANGULAR rate now shaped and recorded in evals; (c) stage L2-150 dropped
(L2b full-height-gentle covers it); (d) best-params carry prefers lower
touchdown speed over pad rate.

(Inherited part-D header follows.)

Part C (seed 0): the curriculum transfers the braking skill — full-drop
touchdown median 29 m/s / p10 10.5 at pad_rate 0.55 (vs 85 m/s for every
flat recipe) — but no soft (<1 m/s) touchdowns. Diagnosis: (a) the
stochastic training policy's sigma (~0.55, entropy stuck ~3.5) injects
more terminal-velocity noise than the 1.0 m/s threshold allows, so the
advantage signal for the last few m/s drowns (the same failure mode as
mode-8 hovering, fixed there by log_std_range); (b) L2->L3 raises the
drop height AND adds the -100 m/s entry in one jump. Changes:
  - log_std_range=(-3.5, -1.0), init_log_std=-1.2 (precision terminal)
  - touch bonus steepened: 200 - 40*min(v_touch, 5)
  - new L0 (ceiling 15: soft touch nearly free -> the value function
    sees the complete tier early) and L2b (full height, gentle) stages
  - L3 budget 0.8B


Part B taught: at 2% fuel with potential-based speed shaping alone, PPO
stays in the pad-seeking dive (the stock reward's -5 loiter penalty +
termination-on-touchdown makes early death cheap, and the 100 m/s dive
is 700 updates deep before any thrust-use gradient appears). Part C uses
the repo's proven curriculum recipe (traj_slow: pre-train the missing
SKILL, then transfer): learn the LANDING PHASE first from a low gentle
spawn, then raise the drop until the full task.

Training reward (deliberately NOT the stock objective — the stock
optimum is the dive; tier evals below always run the true env):
  r_train = stock_reward            (navigation shaping, +20 pad, +500)
            + 5/step                (neutralize the loiter penalty)
            + 5 * (|v_prev|-|v|)    (deceleration shaping)
            + on first pad contact: 100 - 20*min(|v_touch|, 5)

Stages (all 2% fuel, full xy/orn randomization, noisy boosters):
  L1 ceiling 40, gentle drop (no -100 m/s), 0.4B steps
  L2 ceiling 150, gentle drop, 0.4B steps, warm-start from L1
  L3 ceiling 500, accelerated -100 m/s drop (the full variant task),
     0.6B steps, warm-start from L2
Tier evals (pad/soft/complete on the UNSHAPED env of each stage's
geometry) every 50 updates; final 256-episode eval on the full task.

Run (holds the TPU):
    timeout 14400 python docs/artifacts/rocket_rl_r5c.py
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

OUT = f"{ART}/rocket_rl_r5g_tpu.jsonl"
open(OUT, "w").close()

FUEL = 0.02


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:600], flush=True)


@dataclasses.dataclass(frozen=True)
class LandingObjectiveEnv(RocketLandingEnv):
    """Training-only reward surgery (see module docstring)."""

    decel_k: float = 5.0
    loiter_neutralize: float = 5.0
    touch_bonus: float = 200.0
    touch_speed_k: float = 40.0
    # the fatal check is |v|>1.0 OR |omega|>0.35 (rocket_landing.py:138) —
    # shape BOTH at touchdown or the policy lands slow but spinning
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


# max_displacement also scales the random spawn xy (spawn_range = 0.1x),
# so early stages start near the pad laterally as well as vertically
@dataclasses.dataclass(frozen=True)
class MixedSpawnEnv(LandingObjectiveEnv):
    """Spawn height uniform over [z_lo, z_hi] (not the stock 0.8-0.9x
    ceiling band); xy spawn offset scales with height so low spawns start
    near the pad. Entry velocity -entry_speed * (z/z_hi) when
    accelerate_drop (tall spawns get the full -100 m/s, low spawns a
    proportional fraction)."""

    z_lo: float = 12.0
    z_hi: float = 400.0
    entry_speed: float = 0.0

    def sample_spawn(self, key):
        dtype = self.cfg.dtype
        k_xy, k_z, k_orn = jax.random.split(key, 3)
        z = jax.random.uniform(k_z, (), dtype, self.z_lo, self.z_hi)
        frac = z / self.z_hi
        spawn_range = 20.0 * frac + 1.0
        xy = jax.random.uniform(k_xy, (2,), dtype, -spawn_range, spawn_range)
        pos = jnp.concatenate([xy, z[None]])
        orn = jax.random.uniform(k_orn, (3,), dtype, -0.3, 0.3) * frac
        lin_vel = jnp.zeros(3, dtype=dtype).at[2].add(
            -self.entry_speed * frac
        )
        return pos, orn, lin_vel


STAGES = [
    ("M1", dict(entry_speed=0.0), 1_800_000_000),
    ("M2", dict(entry_speed=100.0), 1_200_000_000),
]
CFG = PPOConfig(num_envs=8192, rollout_steps=128, num_epochs=4,
                num_minibatches=32, learning_rate=3e-4, clip_eps=0.2,
                init_log_std=-1.2, log_std_range=(-3.5, -1.0),
                cached_reset_refresh=64)


def make_landing_eval(ppo, eval_env, n):
    @jax.jit
    def run(params, keys):
        st, obs = vec_reset(eval_env, keys)

        def body(carry, _):
            st, obs, done, complete, pad, fatal, ep_rew, tspeed, tomega = carry
            a = ppo.act_deterministic(params, obs)
            st2, out = jax.vmap(eval_env.step)(st, a)
            live = ~done
            complete = complete | (out.info["env_complete"] & live)
            padn = (st2.pad_contact_flag > 0.5) & live
            tspeed = jnp.where(
                padn & ~pad, jnp.linalg.norm(st2.prev_lin_vel, axis=-1),
                tspeed,
            )
            tomega = jnp.where(
                padn & ~pad, jnp.linalg.norm(st2.prev_ang_vel, axis=-1),
                tomega,
            )
            pad = pad | padn
            fatal = fatal | (out.info["fatal_collision"] & live)
            ep_rew = ep_rew + out.reward * live
            done = done | out.termination | out.truncation
            return (st2, out.obs, done, complete, pad, fatal, ep_rew,
                    tspeed, tomega), None

        z = jnp.zeros(n, bool)
        init = (st, obs, z, z, z, z, jnp.zeros(n), jnp.full(n, -1.0),
                jnp.full(n, -1.0))
        (st, obs, done, complete, pad, fatal, ep_rew, tspeed, tomega), _ = (
            jax.lax.scan(body, init, None, length=eval_env.max_steps + 2)
        )
        return complete, pad, fatal, ep_rew, tspeed, tomega

    def landing_eval(params, key):
        keys = jax.random.split(key, n)
        complete, pad, fatal, ep_rew, tspeed, tomega = run(params, keys)
        pad_np = np.asarray(pad)
        fatal_np = np.asarray(fatal)
        ts = np.asarray(tspeed)
        tw = np.asarray(tomega)
        ts_pad = ts[pad_np] if pad_np.any() else np.asarray([-1.0])
        tw_pad = tw[pad_np] if pad_np.any() else np.asarray([-1.0])
        return {
            "episodes": n,
            "pad_rate": float(pad_np.mean()),
            "soft_rate": float((pad_np & ~fatal_np).mean()),
            "complete_rate": float(np.asarray(complete).mean()),
            "fatal_rate": float(fatal_np.mean()),
            "mean_ep_reward": float(np.asarray(ep_rew).mean()),
            "touchdown_speed_med": float(np.median(ts_pad)),
            "touchdown_speed_p10": float(np.percentile(ts_pad, 10)),
            "touchdown_omega_med": float(np.median(tw_pad)),
            "touchdown_omega_p10": float(np.percentile(tw_pad, 10)),
        }

    return landing_eval


def score(le):
    med = le["touchdown_speed_med"]
    med = med if (le["pad_rate"] > 0 and med >= 0) else 1e9
    return (le["complete_rate"], le["soft_rate"], -med, le["pad_rate"])


params = None
for seed in (0,):
    params = None
    for stage, env_kw, budget in STAGES:
        train_env = MixedSpawnEnv(starting_fuel_ratio=FUEL, **env_kw)
        # tier evals on the mixed-spawn geometry WITHOUT reward surgery
        # (tier flags are reward-independent); the FINAL eval below uses
        # the stock full-height env
        eval_env = MixedSpawnEnv(
            starting_fuel_ratio=FUEL, decel_k=0.0, loiter_neutralize=0.0,
            touch_bonus=0.0, touch_speed_k=0.0, touch_omega_bonus=0.0,
            touch_omega_k=0.0, **env_kw)
        ppo = PPO(train_env, CFG)
        it = jax.jit(ppo.train_iteration)
        ev = make_landing_eval(ppo, eval_env, 64)
        runner = ppo.init(jax.random.PRNGKey(seed * 7 + 1))
        if params is not None:
            carried = jax.tree.map(jnp.asarray, params)
            # re-open exploration at each stage transition: part D showed a
            # converged-tight sigma (entropy -1.3) cannot adapt the braking
            # profile to a new drop regime (L3 regressed 29 -> 44 m/s).
            # The navigation/terminal skill lives in the trunk weights; the
            # log_std restarts at the stage's init and re-anneals.
            carried = dict(carried, params=dict(
                carried["params"],
                log_std=jnp.full_like(
                    carried["params"]["log_std"], CFG.init_log_std
                ),
            ))
            runner = runner.replace(params=carried)
        per_update = CFG.batch_size
        updates = budget // per_update
        rows = []
        best = None
        best_params = None
        t0 = time.time()
        for u in range(1, updates + 1):
            runner, m = it(runner)
            if u % 50 == 0 or u == updates:
                le = ev(runner.params,
                        jax.random.fold_in(jax.random.PRNGKey(11), u))
                row = {"update": u, "env_steps": u * per_update,
                       "steps_per_s": round(
                           u * per_update / (time.time() - t0)),
                       "mean_reward": float(m["mean_reward"]),
                       "entropy": float(m["entropy"]), **le}
                rows.append(row)
                if best is None or score(le) > best:
                    best = score(le)
                    best_params = jax.tree.map(np.asarray, runner.params)
                print(stage, seed,
                      json.dumps({k: (round(v, 3) if isinstance(v, float)
                                      else v) for k, v in row.items()}),
                      flush=True)
                # rung mastered: move the budget up the ladder
                if le["soft_rate"] >= 0.25 and u >= updates // 4:
                    break
        params = best_params  # carry the stage's best into the next
        emit({"stage": stage, "seed": seed, "env": env_kw,
              "train_wall_s": round(time.time() - t0),
              "best": rows and max(rows, key=lambda r: score(r)),
              "last": rows[-1] if rows else None})
        del ppo, it, runner

    # final: 256-episode eval on the FULL task env (stage L3 geometry)
    full_eval_env = RocketLandingEnv(starting_fuel_ratio=FUEL)
    ppo = PPO(LandingObjectiveEnv(starting_fuel_ratio=FUEL), CFG)
    ev256 = make_landing_eval(ppo, full_eval_env, 256)
    stock256 = make_landing_eval(ppo, RocketLandingEnv(), 256)
    bp = jax.tree.map(jnp.asarray, params)
    final = ev256(bp, jax.random.PRNGKey(999))
    cross = stock256(bp, jax.random.PRNGKey(999))
    ckpt = f"{ART}/policies_rocket_r5g_seed{seed}"
    checkpoint.save(ckpt, {"params": params})
    emit({"stage": "FINAL", "seed": seed, "fuel": FUEL,
          "final_eval_256": final, "stock_fuel_cross_eval_256": cross,
          "best_ckpt": ckpt})
    del ppo
print("done", round(time.time() - T0), "s", flush=True)
