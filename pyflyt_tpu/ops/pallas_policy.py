"""Fused actor-critic forward as ONE Mosaic kernel (rollout fast path).

The PPO rollout's policy forward in XLA materializes every (B, 256) trunk
activation through HBM — matmuls are separate XLA kernels and only
elementwise ops fuse into them, so at 64K envs each rollout step moves
~270 MB of f32 activations (measured: the rollout phase runs at ~74M
env-steps/s while the packed env kernel alone does 178M — the policy
forward is the gap; docs/PERF.md round-4 section). This kernel keeps the
whole MLP's weights AND intermediate activations VMEM-resident: per grid
step it reads one (chunk, obs_dim) block and writes (chunk, act_dim)
mean + (chunk, 1) value — HBM traffic drops from ~4.3 KB to ~88 B per
env-step and the forward becomes MXU-bound.

Matmuls use the same bf16-input/f32-accumulate arithmetic as the fused
SGD kernel (:mod:`pallas_sgd` ``_mm``) — XLA's default TPU matmul
precision for f32 operands, measured bit-identical to the XLA forward on
v5e (docs/artifacts/ppo_20m_r4n_tpu.jsonl stage B0: mean |delta logp|
3.7e-8). Opt-in via ``PPOConfig(fused_rollout_forward=True)``; the
exact-XLA ``network.apply`` stays the default (CLAUDE.md conventions).

Reference workload parity: accelerates the SB3 ``policy(obs)`` calls in
``collect_rollouts`` driven by
/root/reference/PyFlyt/rl_training/hovering/training.py:159-206.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pyflyt_tpu.ops.pallas_sgd import _leaf_specs, _mm


def build_policy_value_forward(
    *,
    obs_dim: int,
    act_dim: int,
    pi_sizes: tuple,
    vf_sizes: tuple,
    chunk: int = 2048,
    interpret: bool | None = None,
):
    """Returns ``run(obs, leaves) -> (mean (n, act), value (n,))``.

    ``obs``: (n, obs_dim) float32, n divisible by the effective chunk.
    ``leaves``: the full ordered leaf list from
    :func:`pallas_sgd.params_to_leaves` (log_std is carried but unused —
    the caller reads it from the params tree directly).
    """
    if interpret is None:
        from pyflyt_tpu.ops import pallas_math

        interpret = bool(
            getattr(pallas_math, "_FORCE_INTERPRET", False)
            or jax.default_backend() == "cpu"
        )
    net = dict(
        obs_dim=obs_dim,
        act_dim=act_dim,
        pi_sizes=tuple(pi_sizes),
        vf_sizes=tuple(vf_sizes),
        log_std_range=None,
    )
    leaf_shapes = [s for _, s in _leaf_specs(net)]
    n_leaves = len(leaf_shapes)
    n_pi = len(pi_sizes)
    n_vf = len(vf_sizes)
    i_pi_head = 2 * n_pi
    i_vf0 = i_pi_head + 3  # skip pi_head w/b + log_std
    i_vf_head = i_vf0 + 2 * n_vf

    def kern(*refs):
        x = refs[0][...]
        leaves = [refs[1 + i][...] for i in range(n_leaves)]
        mean_ref = refs[1 + n_leaves]
        val_ref = refs[2 + n_leaves]
        a = x
        for i in range(n_pi):
            a = jnp.tanh(_mm(a, leaves[2 * i]) + leaves[2 * i + 1])
        mean_ref[...] = _mm(a, leaves[i_pi_head]) + leaves[i_pi_head + 1]
        a = x
        for i in range(n_vf):
            a = jnp.tanh(
                _mm(a, leaves[i_vf0 + 2 * i]) + leaves[i_vf0 + 2 * i + 1]
            )
        val_ref[...] = _mm(a, leaves[i_vf_head]) + leaves[i_vf_head + 1]

    def run(obs, leaves):
        n = obs.shape[0]
        ck = min(chunk, n)
        while n % ck:  # same fallback as build_logp_forward: halve until
            ck //= 2  # the chunk divides the batch (e.g. 3000 envs @ 2048)
        const = lambda g: (0, 0)  # noqa: E731
        kwargs = {}
        if not interpret:
            from jax.experimental.pallas import tpu as pltpu

            # big chunks carry several (chunk, 256) f32 activations live
            # at once — raise the 16MB default scoped-vmem budget
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        mean, value = pl.pallas_call(
            kern,
            grid=(n // ck,),
            in_specs=[
                pl.BlockSpec((ck, obs_dim), lambda g: (g, 0)),
                *[pl.BlockSpec(s, const) for s in leaf_shapes],
            ],
            out_specs=[
                pl.BlockSpec((ck, act_dim), lambda g: (g, 0)),
                pl.BlockSpec((ck, 1), lambda g: (g, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, act_dim), jnp.float32),
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
            ],
            interpret=interpret,
            **kwargs,
        )(obs, *leaves)
        return mean, value[:, 0]

    return run
