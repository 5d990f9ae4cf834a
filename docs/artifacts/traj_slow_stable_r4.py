"""Round-4 trajectory_following_slow STABILITY campaign (VERDICT item 2).

Round 3 proved the hovering-transfer curriculum produces the first positive
slow-trajectory policy (+7455 best eval / +3401 independent, docs/artifacts/
traj_slow_curriculum_tpu.jsonl) but late training degrades and the
eval-stabilization machinery (param EMA, eval early stopping, checkpoint
averaging — rl/train.py TrainConfig) landed without a validating TPU run.

This campaign runs the full curriculum TWICE (seeds 0/1) WITH that machinery
and scores every candidate checkpoint with an independent 32-episode eval:

  per seed:
    H  — mod-hovering pre-train (dome 100, wind+noise, ref-exact
         [64,64,32,32] net, mode 9, the solved mode-9 recipe) 1.8B steps
    S  — slow fine-tune warm-started from H's best checkpoint, 2.0B budget,
         param_ema=0.998, eval_episodes=32, early_stop_patience=15
    E  — independent 32-episode evals (fresh seed) of: best raw ckpt,
         best EMA ckpt, uniform average of the last-3 raw best ckpts

Success bar (VERDICT round 3): independent eval >= +3000 for both seeds.
Output: docs/artifacts/traj_slow_stable_tpu.jsonl (one JSON line per stage)
and the winning policies archived under docs/artifacts/
policies_traj_slow_r4_seed{K}.

Reference counterpart: /root/reference/PyFlyt/rl_training/
trajectory_following_slow/training.py:206-211 — the reference itself only
ever fine-tunes slow from an 801-step-episode checkpoint (PPO.load).

Run (holds the TPU for the duration):
    timeout 14400 python docs/artifacts/traj_slow_stable_r4.py
"""

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

ART = "/root/repo/docs/artifacts/traj_slow_stable_tpu.jsonl"
RUNS = "/root/repo/runs/traj_slow_r4"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

from pyflyt_tpu.envs.quadx_mod import (  # noqa: E402
    QuadXModHoveringEnv,
    QuadXTrajectoryFollowingSlowEnv,
)
from pyflyt_tpu.rl import PPO, PPOConfig, TrainConfig, train, checkpoint  # noqa: E402

ARCH = dict(feature_sizes=(), pi_sizes=(64, 64, 32, 32), vf_sizes=(64, 64, 32, 32))
RECIPE = dict(
    num_envs=2048, rollout_steps=128, num_epochs=10, num_minibatches=64,
    learning_rate=1e-4, clip_eps=0.1, init_log_std=-1.6,
)


def emit(row):
    row["wall_s"] = round(time.time() - T0)
    with open(ART, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:400], flush=True)


def run_stage(name, ppo, tcfg, keep_every=5):
    rows = []

    def on_metrics(u, row):
        rows.append(row)
        print(name, json.dumps({k: round(v, 2) for k, v in row.items()
                                if k in ("update", "env_steps", "steps_per_s",
                                         "eval_mean_reward", "eval_mean_length",
                                         "eval_ema_mean_reward")}), flush=True)

    train(ppo, tcfg, on_metrics=on_metrics)
    emit({"stage": name, "config": {"total_timesteps": tcfg.total_timesteps,
                                    "param_ema": tcfg.param_ema,
                                    "early_stop_patience": tcfg.early_stop_patience,
                                    "eval_episodes": tcfg.eval_episodes,
                                    "seed": tcfg.seed},
          "rows": rows[::keep_every] + rows[-1:]})
    return rows


def best_ckpts(log_dir):
    """(raw sorted by save time, ema sorted by save time)."""
    all_ = sorted(glob.glob(os.path.join(log_dir, "best_model_*")),
                  key=os.path.getmtime)
    raw = [p for p in all_ if "_ema_" not in os.path.basename(p)]
    ema = [p for p in all_ if "_ema_" in os.path.basename(p)]
    return raw, ema


def independent_eval(ppo, params, seed, episodes=32):
    stats = jax.jit(ppo.evaluate, static_argnums=2)(
        params, jax.random.PRNGKey(seed), episodes)
    return {k: float(v) for k, v in stats.items()}


for seed in (0, 1):
    hover_dir = f"{RUNS}/h_seed{seed}"
    slow_dir = f"{RUNS}/s_seed{seed}"

    # ---- stage H: hovering pre-train (the hold-skill source task) --------
    env_h = QuadXModHoveringEnv(
        flight_mode=9, orn_conv="NED_FRD", control_hz=80, simulate_wind=True,
        noisy_motors=True, flight_dome_size=100, max_duration_seconds=10.0)
    ppo_h = PPO(env_h, PPOConfig(**RECIPE, **ARCH))
    run_stage(f"H-seed{seed}", ppo_h, TrainConfig(
        total_timesteps=1_800_000_000, eval_every_updates=50,
        eval_episodes=16, log_dir=hover_dir, seed=seed))
    h_raw, _ = best_ckpts(hover_dir)
    print(f"H-seed{seed} best:", os.path.basename(h_raw[-1]), flush=True)

    # ---- stage S: slow fine-tune with the stabilization machinery --------
    env_s = QuadXTrajectoryFollowingSlowEnv(
        flight_mode=9, control_hz=80, simulate_wind=True, noisy_motors=True,
        flight_dome_size=100, max_duration_seconds=10.0)
    ppo_s = PPO(env_s, PPOConfig(**RECIPE, **ARCH))
    run_stage(f"S-seed{seed}", ppo_s, TrainConfig(
        total_timesteps=2_000_000_000, eval_every_updates=20,
        eval_episodes=32, log_dir=slow_dir, seed=seed + 100,
        init_from=h_raw[-1], param_ema=0.998, early_stop_patience=15))

    # ---- stage E: independent scoring of the candidates ------------------
    s_raw, s_ema = best_ckpts(slow_dir)
    tmpl = ppo_s.init(jax.random.PRNGKey(0))
    candidates = {}
    if s_raw:
        candidates["best_raw"] = checkpoint.restore_params(s_raw[-1], tmpl.params)
    if s_ema:
        candidates["best_ema"] = checkpoint.restore_params(s_ema[-1], tmpl.params)
    if len(s_raw) >= 2:
        candidates["avg_last3_raw"] = checkpoint.average_params(
            s_raw[-3:], tmpl.params)
    scores = {}
    for cname, params in candidates.items():
        scores[cname] = independent_eval(ppo_s, params, seed=1234 + seed)
        print(f"E-seed{seed} {cname}:", scores[cname], flush=True)
    emit({"stage": f"E-seed{seed}", "ckpts": {
            "raw": [os.path.basename(p) for p in s_raw],
            "ema": [os.path.basename(p) for p in s_ema]},
          "independent_eval_32ep": scores})

    # archive the winner
    if scores:
        win = max(scores, key=lambda c: scores[c]["mean_reward"])
        src = {"best_raw": s_raw[-1:] and s_raw[-1],
               "best_ema": s_ema[-1:] and s_ema[-1]}.get(win)
        dst = f"/root/repo/docs/artifacts/policies_traj_slow_r4_seed{seed}"
        if win == "avg_last3_raw":
            # materialize the averaged params as a checkpoint
            runner = tmpl.replace(params=candidates[win])
            checkpoint.save(dst, runner)
        elif src:
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(src, dst)
        emit({"stage": f"archive-seed{seed}", "winner": win,
              "score": scores[win], "path": dst})

print("CAMPAIGN DONE in", round(time.time() - T0), "s", flush=True)
