"""Round-4 fused-SGD health diagnosis (part N): find the Mosaic-only bias.

Part F stage C2 showed the fused epoch kernel trains UNHEALTHILY on
hardware (3B-step mode-9 run never solves, mean_reward plateaus at ~-88,
entropy climbs monotonically) despite f32-exact one-iteration parity and a
5e-5 two-iteration on-chip drift gate.

Hypothesis under test — the RATIO CHANNEL. The XLA path recomputes the
forward for old_log_prob with the SAME arithmetic at epoch 1 (ratio == 1
essentially bit-exactly at the first minibatch); the fused kernel's Mosaic
forward differs from the rollout's XLA forward by a state-correlated
delta, so every ratio the kernel sees carries exp(delta) noise. With
log_std ~= -1.6 (sigma 0.2), dlogp/dmean ~ (a-mu)/sigma^2 ~ 5z per dim: a
~1e-3 forward mean difference becomes |delta logp| ~ 1e-2 — 10-100x the
genuine per-minibatch KL (~1e-4 measured in healthy runs). The pg
gradient would then be dominated by rounding-correlated pseudo-signal.

  A  — on-chip elementwise parity: Mosaic vs XLA tanh / exp on dense
       ranges (the two transcendentals in the SGD math path).
  B0 — delta-logp statistics at realistic params (after 50 XLA updates):
       (i)  XLA epoch-recompute logp vs rollout-stored logp (the healthy
            path's own mismatch — expected ~0),
       (ii) kernel-arithmetic forward logp (same bf16 _mm dots, pallas)
            vs rollout-stored logp,
       each as mean/std/max |delta| + corr(delta, advantage), against the
       scale bars clip_eps=0.1 and the healthy per-update KL.
  B  — ghost A/B: advance training with the XLA path; at each update ALSO
       run the fused train_iteration from the SAME RunnerState and log the
       per-update divergence (log_std signed diff, per-group param-diff
       norms relative to the XLA update's own norm, approx_kl of both
       paths). 200 updates at the 8192-env solve recipe.

Run (holds the TPU):
    timeout 5400 python docs/artifacts/ppo_20m_r4n.py
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ART = "/root/repo/docs/artifacts"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

from pyflyt_tpu.envs.quadx_mod.packed_hovering import (  # noqa: E402
    PackedQuadXModHoveringEnv,
)
from pyflyt_tpu.ops import pallas_sgd  # noqa: E402
from pyflyt_tpu.rl import PPO, PPOConfig  # noqa: E402
from pyflyt_tpu.rl.networks import gaussian_log_prob  # noqa: E402

OUT = f"{ART}/ppo_20m_r4n_tpu.jsonl"
open(OUT, "w").close()

ENV_KW = dict(
    flight_mode=9, orn_conv="NED_FRD", control_hz=80, simulate_wind=True
)


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:600], flush=True)


# ---- stage A: Mosaic vs XLA transcendental parity ---------------------------
def elementwise_parity(name, fn, lo, hi, n=1024 * 128):
    x = jnp.linspace(lo, hi, n, dtype=jnp.float32).reshape(-1, 128)

    def kern(x_ref, o_ref):
        o_ref[...] = fn(x_ref[...])

    mosaic = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32)
    )(x)
    xla = jax.jit(fn)(x)
    x64 = np.asarray(x, np.float64)
    ref = getattr(np, name)(x64)
    m = np.asarray(mosaic, np.float64)
    g = np.asarray(xla, np.float64)
    scale = np.maximum(np.abs(ref), 1e-30)
    emit(
        {
            "stage": "A",
            "fn": name,
            "range": [lo, hi],
            "max_abs_mosaic_vs_xla": float(np.max(np.abs(m - g))),
            "max_rel_mosaic_vs_f64": float(np.max(np.abs(m - ref) / scale)),
            "max_rel_xla_vs_f64": float(np.max(np.abs(g - ref) / scale)),
            "mean_signed_mosaic_minus_xla": float(np.mean(m - g)),
        }
    )


elementwise_parity("tanh", jnp.tanh, -6.0, 6.0)
elementwise_parity("exp", jnp.exp, -20.0, 3.0)

# ---- setup: PPO pair on the solve recipe ------------------------------------
CFG_X = PPOConfig(
    num_envs=8192,
    rollout_steps=128,
    num_epochs=3,
    num_minibatches=128,
    learning_rate=2e-4,
    clip_eps=0.1,
    init_log_std=-1.6,
)
CFG_F = dataclasses.replace(CFG_X, fused_sgd=True)

env = PackedQuadXModHoveringEnv.create(**ENV_KW)
ppo_f = PPO(env, CFG_F)
ppo_x = PPO(env, CFG_X)
# identical optimizer STATE STRUCTURE so one RunnerState feeds both paths
# (optax.flatten is math-identical; the fused kernel needs tree moments)
ppo_x.optimizer = ppo_f.optimizer
runner = ppo_x.init(jax.random.PRNGKey(0))
it_x = jax.jit(ppo_x.train_iteration)
it_f = jax.jit(ppo_f.train_iteration)

print("warming up (50 XLA updates to realistic params)...", flush=True)
for _ in range(50):
    runner, m = it_x(runner)
jax.block_until_ready(runner.params)
emit({"stage": "warmup", "updates": 50, "kl_xla": float(m["approx_kl"])})


# ---- stage B0: the delta-logp measurement -----------------------------------
def kernel_logp_fn(obs_dim, act_dim, pi_sizes, log_std_range, chunk, n_rows):
    """Policy logp with EXACTLY the fused kernel's forward arithmetic
    (pallas_sgd._mm bf16 dots + f32 tanh), Mosaic-lowered."""
    n_pi = len(pi_sizes)
    n_leaves = 2 * n_pi + 3  # trunk w/b pairs + head w/b + log_std
    feat = obs_dim + act_dim

    def kern(*refs):
        rows = refs[0][...]
        leaves = [refs[1 + i][...] for i in range(n_leaves)]
        o_ref = refs[1 + n_leaves]
        x = rows[:, :obs_dim]
        action = rows[:, obs_dim : obs_dim + act_dim]
        a = x
        for i in range(n_pi):
            a = jnp.tanh(
                pallas_sgd._mm(a, leaves[2 * i]) + leaves[2 * i + 1]
            )
        mean = pallas_sgd._mm(a, leaves[2 * n_pi]) + leaves[2 * n_pi + 1]
        log_std = leaves[2 * n_pi + 2]
        if log_std_range is not None:
            log_std = jnp.clip(log_std, *log_std_range)
        var = jnp.exp(2.0 * log_std)
        diff = action - mean
        lp = -0.5 * (diff * diff / var + 2.0 * log_std + pallas_sgd._LOG2PI)
        logp = jnp.sum(lp, axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        o_ref[...] = jnp.where(lane == 0, logp, 0.0)

    def run(rows, leaves):
        n_chunks = n_rows // chunk
        shapes = [lv.shape for lv in leaves]
        const = lambda ck: (0, 0)  # noqa: E731
        out = pl.pallas_call(
            kern,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((chunk, feat), lambda ck: (ck, 0)),
                *[pl.BlockSpec(s, const) for s in shapes],
            ],
            out_specs=pl.BlockSpec((chunk, 128), lambda ck: (ck, 0)),
            out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
        )(rows, *leaves)
        return out[:, 0]

    return run


roll_runner, traj = jax.jit(ppo_x._rollout)(runner)
advantages, _ = jax.jit(ppo_x._gae)(runner.params, traj, roll_runner.obs)
N = 65536  # rows analyzed (first N of the 1M batch)
flat_obs = traj.obs.reshape(CFG_X.batch_size, -1)[:N]
flat_act = traj.action.reshape(CFG_X.batch_size, -1)[:N]
flat_lp = traj.log_prob.reshape(-1)[:N]
flat_adv = advantages.reshape(-1)[:N]
obs_dim, act_dim = flat_obs.shape[-1], flat_act.shape[-1]

# (i) XLA epoch recompute (the healthy path's arithmetic)
mean_x, ls_x, _ = jax.jit(ppo_x.network.apply)(runner.params, flat_obs)
logp_x = gaussian_log_prob(mean_x, ls_x, flat_act)

# (ii) kernel-arithmetic forward
pi_sizes = tuple(CFG_X.feature_sizes) + tuple(CFG_X.pi_sizes)
leaves = pallas_sgd.params_to_leaves(runner.params)
pi_leaves = leaves[: 2 * len(pi_sizes) + 3]
rows = jnp.concatenate([flat_obs, flat_act], axis=1)
logp_k = kernel_logp_fn(
    obs_dim, act_dim, pi_sizes, CFG_X.log_std_range, 1024, N
)(rows, pi_leaves)


def delta_stats(tag, logp, stored, adv):
    d = np.asarray(logp - stored, np.float64)
    a = np.asarray(adv, np.float64)
    a_n = (a - a.mean()) / (a.std() + 1e-8)
    emit(
        {
            "stage": "B0",
            "which": tag,
            "mean_delta": float(d.mean()),
            "std_delta": float(d.std()),
            "max_abs_delta": float(np.abs(d).max()),
            "mean_abs_delta": float(np.abs(d).mean()),
            "corr_delta_advn": float(np.corrcoef(d, a_n)[0, 1]),
            "mean_ratio_minus_1": float(np.mean(np.exp(d) - 1.0)),
            # the spurious pg term the delta injects: E[adv_n * (e^d - 1)]
            "mean_advn_times_ratio_err": float(
                np.mean(a_n * (np.exp(d) - 1.0))
            ),
        }
    )


delta_stats("xla_recompute_vs_stored", logp_x, flat_lp, flat_adv)
delta_stats("kernel_forward_vs_stored", logp_k, flat_lp, flat_adv)
del roll_runner, traj, advantages, flat_obs, flat_act, rows

# ---- stage B: ghost A/B -----------------------------------------------------
GROUPS = {
    "pi_trunk": lambda p: p["params"]["pi_trunk"],
    "pi_head": lambda p: p["params"]["pi_head"],
    "log_std": lambda p: p["params"]["log_std"],
    "vf_trunk": lambda p: p["params"]["vf_trunk"],
    "vf_head": lambda p: p["params"]["vf_head"],
}


def tnorm(t):
    return float(
        jnp.sqrt(
            sum(jnp.sum(x * x) for x in jax.tree.leaves(t))
        )
    )


rows_out = []
ls_diff_sum = 0.0
for u in range(200):
    r_f, m_f = it_f(runner)
    r_x, m_x = it_x(runner)
    rec = {"update": u}
    for g, get in GROUPS.items():
        upd = jax.tree.map(
            lambda a, b: a - b, get(r_x.params), get(runner.params)
        )
        dif = jax.tree.map(
            lambda a, b: a - b, get(r_f.params), get(r_x.params)
        )
        n_upd, n_dif = tnorm(upd), tnorm(dif)
        rec[f"{g}_rel_div"] = n_dif / (n_upd + 1e-30)
    ls_f = np.asarray(r_f.params["params"]["log_std"], np.float64)
    ls_xv = np.asarray(r_x.params["params"]["log_std"], np.float64)
    rec["ls_signed_diff"] = float((ls_f - ls_xv).mean())
    rec["kl_xla"] = float(m_x["approx_kl"])
    rec["kl_fused"] = float(m_f["approx_kl"])
    rec["ent_xla"] = float(m_x["entropy"])
    rec["ent_fused"] = float(m_f["entropy"])
    ls_diff_sum += rec["ls_signed_diff"]
    rows_out.append(rec)
    if u % 20 == 0:
        print(json.dumps({k: round(v, 6) for k, v in rec.items()}),
              flush=True)
    runner = r_x

rel_divs = {
    g: float(np.mean([r[f"{g}_rel_div"] for r in rows_out]))
    for g in GROUPS
}
emit(
    {
        "stage": "B",
        "updates": len(rows_out),
        "mean_rel_divergence_per_group": rel_divs,
        "cum_ls_signed_diff": ls_diff_sum,
        "mean_kl_xla": float(np.mean([r["kl_xla"] for r in rows_out])),
        "mean_kl_fused": float(np.mean([r["kl_fused"] for r in rows_out])),
        "rows": rows_out[::10] + rows_out[-1:],
    }
)
print("done", round(time.time() - T0), "s", flush=True)
