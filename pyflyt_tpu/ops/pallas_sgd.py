"""Fused PPO minibatch-SGD epoch as ONE Mosaic kernel.

The XLA epoch (rl/ppo.py train_iteration) is a 64-step sequential scan whose
per-step cost is dominated by op dispatch around tiny matmuls: measured on
v5e (docs/artifacts/ppo_phase_profile_tpu.jsonl) the pure fwd+bwd scan runs
at ~40-55 us/minibatch against a ~17 us matmul roofline, and the optimizer/
loss elementwise ops add again as much. This kernel runs the WHOLE epoch in
one ``pallas_call``:

- grid = (num_minibatches, row_chunks): Mosaic iterates row-major, so all
  chunks of minibatch 0 run before minibatch 1 — the sequential SGD
  semantics are preserved while Pallas double-buffers the next chunk's HBM
  loads behind the current chunk's compute.
- The policy/value parameters and the Adam moments live in the kernel's
  OUTPUT refs (constant index_map keeps them VMEM-resident across all grid
  steps; they are initialized from the input refs at step 0). Each
  minibatch's gradient accumulates in VMEM scratch across its row chunks;
  at the last chunk the global-norm clip + Adam update are applied
  in-register, exactly the ``optax.chain(clip_by_global_norm, adam)``
  semantics (eps=1e-5, eps_root=0, bias correction by ``1 - b**t``).
- Forward, PPO clipped-surrogate backward, and the optimizer are all
  hand-derived in-kernel. Matmuls take bfloat16 inputs with float32
  accumulation (``preferred_element_type``) — the SAME arithmetic XLA's
  default TPU matmul precision applies to the float32 reference path, so
  the two paths match at bf16-truncation level. Everything elementwise is
  float32.

The PPO loss matches rl/ppo.py:_loss including its corner cases:
- advantages are normalized per minibatch with the minibatch mean/std
  (precomputed outside and scalar-prefetched — chunking would otherwise
  need a two-pass kernel);
- inside the clip band the two surrogate terms are EQUAL and jax.lax.min
  splits the cotangent 50/50 between them, which sums back to the plain
  policy-gradient term — replicated here with an explicit tie branch;
- the optional log_std clamp (networks.ActorCritic.log_std_range) zeroes
  the log_std gradient outside the band.

Opt-in via ``PPOConfig(fused_sgd=True)`` — the exact-semantics XLA path
stays the default (CLAUDE.md conventions). Reference workload parity:
the SB3 PPO.train loop this accelerates is
/root/reference/PyFlyt/rl_training/hovering/training.py:159-206 (SB3
``n_epochs`` x minibatch Adam steps over the rollout buffer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Adam constants (optax.adam defaults; eps matches rl/ppo.py)
_B1 = 0.9
_B2 = 0.999
_EPS = 1e-5
_LOG2PI = float(np.log(2.0 * np.pi))
_ENT_C = 0.5 * float(np.log(2.0 * np.pi * np.e))

# metric row layout (lane-padded to 128 in the kernel output)
METRICS = ("loss", "pg_loss", "v_loss", "entropy", "approx_kl")


def _mm(a, b):
    """a @ b with bf16 inputs, f32 accumulation — XLA's default TPU
    matmul precision for f32 operands."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_tn(a, b):
    """a.T @ b with bf16 inputs, f32 accumulation (wgrad shape)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_nt(a, b):
    """a @ b.T with bf16 inputs, f32 accumulation (dgrad shape)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _leaf_specs(net):
    """Ordered (name, shape) list of the parameter leaves the kernel sees.

    Mirrors flax's ActorCritic parameter tree (networks.py): pi trunk
    Dense_0..n, pi_head, log_std, vf trunk, vf_head. Biases and log_std are
    carried as (1, n) so every ref is 2-D.
    """
    leaves = []
    d = net["obs_dim"]
    for i, h in enumerate(net["pi_sizes"]):
        leaves.append((f"pi_{i}_w", (d, h)))
        leaves.append((f"pi_{i}_b", (1, h)))
        d = h
    leaves.append(("pi_head_w", (d, net["act_dim"])))
    leaves.append(("pi_head_b", (1, net["act_dim"])))
    leaves.append(("log_std", (1, net["act_dim"])))
    d = net["obs_dim"]
    for i, h in enumerate(net["vf_sizes"]):
        leaves.append((f"vf_{i}_w", (d, h)))
        leaves.append((f"vf_{i}_b", (1, h)))
        d = h
    leaves.append(("vf_head_w", (d, 1)))
    leaves.append(("vf_head_b", (1, 1)))
    return leaves


def params_to_leaves(params):
    """flax ActorCritic param dict -> ordered flat leaf list (2-D arrays)."""
    p = params["params"]
    out = []
    i = 0
    while f"Dense_{i}" in p["pi_trunk"]:
        out.append(p["pi_trunk"][f"Dense_{i}"]["kernel"])
        out.append(p["pi_trunk"][f"Dense_{i}"]["bias"][None, :])
        i += 1
    out.append(p["pi_head"]["kernel"])
    out.append(p["pi_head"]["bias"][None, :])
    out.append(p["log_std"][None, :])
    i = 0
    while f"Dense_{i}" in p["vf_trunk"]:
        out.append(p["vf_trunk"][f"Dense_{i}"]["kernel"])
        out.append(p["vf_trunk"][f"Dense_{i}"]["bias"][None, :])
        i += 1
    out.append(p["vf_head"]["kernel"])
    out.append(p["vf_head"]["bias"][None, :])
    return out


def leaves_to_params(leaves, params_template):
    """Inverse of params_to_leaves (uses the template for structure)."""
    p = dict(params_template["params"])
    it = iter(leaves)
    pi = dict(p["pi_trunk"])
    i = 0
    while f"Dense_{i}" in pi:
        w = next(it)
        b = next(it)
        pi[f"Dense_{i}"] = {"kernel": w, "bias": b[0]}
        i += 1
    p["pi_trunk"] = pi
    w = next(it)
    b = next(it)
    p["pi_head"] = {"kernel": w, "bias": b[0]}
    p["log_std"] = next(it)[0]
    vf = dict(p["vf_trunk"])
    i = 0
    while f"Dense_{i}" in vf:
        w = next(it)
        b = next(it)
        vf[f"Dense_{i}"] = {"kernel": w, "bias": b[0]}
        i += 1
    p["vf_trunk"] = vf
    w = next(it)
    b = next(it)
    p["vf_head"] = {"kernel": w, "bias": b[0]}
    return {"params": p}


def build_logp_forward(
    *,
    obs_dim: int,
    act_dim: int,
    pi_sizes: tuple,
    log_std_range,
    feat: int,
    chunk: int = 1024,
    interpret: bool | None = None,
):
    """Policy log-prob over packed rows with EXACTLY the epoch kernel's
    forward arithmetic (same ``_mm`` bf16 dots + f32 elementwise, Mosaic
    lowering, same ``chunk`` row-block shapes).

    Used by ``PPOConfig.fused_sgd_consistent_logp`` to REWRITE the packed
    buffer's old_log_prob column before the epoch scan. Rationale (the
    round-4 fused-sgd health fix): the XLA path recomputes old_logp's
    forward with the same arithmetic it trains with, so epoch-1 ratios are
    exp(0)=1 bit-exactly; the fused kernel's Mosaic forward differs from
    the rollout's XLA forward by a state-correlated delta and every ratio
    it sees carries exp(delta) rounding noise that can rival the genuine
    per-minibatch KL (~1e-4). Recomputing old_logp with the kernel's own
    arithmetic restores the self-consistent ratio channel. Per-row results
    are independent of which chunk a row lands in (MXU rows don't
    interact), so this matches the epoch kernel's forward regardless of
    the shuffle.

    Returns ``run(packed, pi_leaves) -> (n_rows,) float32`` where
    ``packed`` is the (n_rows, feat) [obs | action | ...] buffer and
    ``pi_leaves`` the leading policy leaves of :func:`params_to_leaves`
    (trunk w/b pairs, head w/b, log_std).
    """
    if interpret is None:
        from pyflyt_tpu.ops import pallas_math

        interpret = bool(
            getattr(pallas_math, "_FORCE_INTERPRET", False)
            or jax.default_backend() == "cpu"
        )
    n_pi = len(pi_sizes)
    n_leaves = 2 * n_pi + 3  # trunk w/b pairs + head w/b + log_std

    def kern(*refs):
        rows = refs[0][...]
        leaves = [refs[1 + i][...] for i in range(n_leaves)]
        o_ref = refs[1 + n_leaves]
        x = rows[:, :obs_dim]
        action = rows[:, obs_dim : obs_dim + act_dim]
        a = x
        for i in range(n_pi):
            a = jnp.tanh(_mm(a, leaves[2 * i]) + leaves[2 * i + 1])
        mean = _mm(a, leaves[2 * n_pi]) + leaves[2 * n_pi + 1]
        log_std = leaves[2 * n_pi + 2]
        if log_std_range is not None:
            log_std = jnp.clip(log_std, *log_std_range)
        var = jnp.exp(2.0 * log_std)
        diff = action - mean
        lp = -0.5 * (diff * diff / var + 2.0 * log_std + _LOG2PI)
        logp = jnp.sum(lp, axis=-1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        o_ref[...] = jnp.where(lane == 0, logp, 0.0)

    def run(packed, pi_leaves):
        n_rows = packed.shape[0]
        # forward-only => no grad/moment residents; use a big chunk so the
        # whole-batch pass is a few grid steps, not ~1000 launch-bound ones
        # (probe r4o measured the 1024-chunk rewrite at ~9 ms/iteration on
        # a 1M-row batch — ~12% of the whole train iteration)
        ck = chunk
        while n_rows % ck != 0:
            ck //= 2
        ck = max(ck, 1)
        shapes = [lv.shape for lv in pi_leaves]
        const = lambda g: (0, 0)  # noqa: E731
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            )
        out = pl.pallas_call(
            kern,
            grid=(n_rows // ck,),
            in_specs=[
                pl.BlockSpec((ck, feat), lambda g: (g, 0)),
                *[pl.BlockSpec(s, const) for s in shapes],
            ],
            out_specs=pl.BlockSpec((ck, 128), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
            interpret=interpret,
            **kwargs,
        )(packed, *pi_leaves)
        return out[:, 0]

    return run


def build_fused_epoch(
    *,
    obs_dim: int,
    act_dim: int,
    pi_sizes: tuple,
    vf_sizes: tuple,
    log_std_range,
    num_minibatches: int,
    minibatch_size: int,
    feat: int,
    learning_rate: float,
    clip_eps: float,
    entropy_coef: float,
    value_coef: float,
    max_grad_norm: float,
    chunk: int = 1024,
    interpret: bool | None = None,
):
    """Returns fn(mbs, adv_stats, t0, leaves, mu, nu) ->
    (new_leaves, new_mu, new_nu, metrics (num_minibatches, len(METRICS))).

    ``mbs``: (num_minibatches, minibatch_size, feat) packed rows
    [obs | action | old_log_prob | adv | ret] (rl/ppo.py packing).
    ``adv_stats``: (num_minibatches, 2) per-minibatch adv mean/std.
    ``t0``: (1,) int32 — Adam step count before this epoch.
    """
    if interpret is None:
        # same convention as ops/pallas_math.grid_call: interpret mode for
        # CPU (tests, driver dryrun), real Mosaic lowering on TPU
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
        log_std_range=log_std_range,
    )
    leaf_shapes = [s for _, s in _leaf_specs(net)]
    n_leaves = len(leaf_shapes)
    chunk = min(chunk, minibatch_size)
    assert minibatch_size % chunk == 0, (minibatch_size, chunk)
    n_chunks = minibatch_size // chunk
    inv_mb = 1.0 / float(minibatch_size)

    n_pi = len(pi_sizes)
    n_vf = len(vf_sizes)
    # leaf indices into the flat list
    i_pi_head = 2 * n_pi
    i_log_std = i_pi_head + 2
    i_vf0 = i_log_std + 1
    i_vf_head = i_vf0 + 2 * n_vf

    def kernel(adv_ref, t0_ref, *refs):
        mb_ref = refs[0]
        in_leaves = refs[1 : 1 + n_leaves]
        in_mu = refs[1 + n_leaves : 1 + 2 * n_leaves]
        in_nu = refs[1 + 2 * n_leaves : 1 + 3 * n_leaves]
        out_leaves = refs[1 + 3 * n_leaves : 1 + 4 * n_leaves]
        out_mu = refs[1 + 4 * n_leaves : 1 + 5 * n_leaves]
        out_nu = refs[1 + 5 * n_leaves : 1 + 6 * n_leaves]
        metrics_ref = refs[1 + 6 * n_leaves]
        gacc = refs[2 + 6 * n_leaves : 2 + 7 * n_leaves]
        macc_ref = refs[2 + 7 * n_leaves]

        mb = pl.program_id(0)
        ck = pl.program_id(1)

        # ---- step 0: bring params/moments into the resident output refs
        @pl.when((mb == 0) & (ck == 0))
        def _init():
            for i in range(n_leaves):
                out_leaves[i][...] = in_leaves[i][...]
                out_mu[i][...] = in_mu[i][...]
                out_nu[i][...] = in_nu[i][...]
            metrics_ref[...] = jnp.zeros(metrics_ref.shape, jnp.float32)

        # ---- chunk 0: zero this minibatch's accumulators
        @pl.when(ck == 0)
        def _zero():
            for i in range(n_leaves):
                gacc[i][...] = jnp.zeros(leaf_shapes[i], jnp.float32)
            macc_ref[...] = jnp.zeros(macc_ref.shape, jnp.float32)

        leaves = [out_leaves[i][...] for i in range(n_leaves)]

        rows = mb_ref[0]  # (chunk, feat) f32
        x = rows[:, :obs_dim]
        action = rows[:, obs_dim : obs_dim + act_dim]
        c0 = obs_dim + act_dim
        old_logp = rows[:, c0 : c0 + 1]  # (chunk, 1)
        adv = rows[:, c0 + 1 : c0 + 2]
        ret = rows[:, c0 + 2 : c0 + 3]

        # ---- forward (activations kept for the backward pass)
        a_pi = [x]
        for i in range(n_pi):
            a_pi.append(
                jnp.tanh(_mm(a_pi[-1], leaves[2 * i]) + leaves[2 * i + 1])
            )
        mean = _mm(a_pi[-1], leaves[i_pi_head]) + leaves[i_pi_head + 1]
        log_std = leaves[i_log_std]  # (1, act_dim)
        if log_std_range is not None:
            log_std = jnp.clip(log_std, *log_std_range)
        a_vf = [x]
        for i in range(n_vf):
            a_vf.append(
                jnp.tanh(
                    _mm(a_vf[-1], leaves[i_vf0 + 2 * i])
                    + leaves[i_vf0 + 2 * i + 1]
                )
            )
        value = _mm(a_vf[-1], leaves[i_vf_head]) + leaves[i_vf_head + 1]
        # value: (chunk, 1)

        # ---- loss pieces (reductions carry 1/minibatch_size)
        var = jnp.exp(2.0 * log_std)  # (1, act_dim)
        diff = action - mean  # (chunk, act_dim)
        lp = -0.5 * (diff * diff / var + 2.0 * log_std + _LOG2PI)
        logp = jnp.sum(lp, axis=-1, keepdims=True)  # (chunk, 1)
        ratio = jnp.exp(logp - old_logp)

        a_mu = adv_ref[mb, 0]
        a_sd = adv_ref[mb, 1]
        adv_n = (adv - a_mu) / (a_sd + 1e-8)

        lo_c, hi_c = 1.0 - clip_eps, 1.0 + clip_eps
        clipped = jnp.clip(ratio, lo_c, hi_c)
        pg1 = ratio * adv_n
        pg2 = clipped * adv_n
        pg_min = jnp.minimum(pg1, pg2)
        verr = value - ret

        # metric partial sums -> lanes 0..2 of the scratch row (built with
        # iota-selects: scatter does not lower on Mosaic)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def _lanes(pairs):
            acc = jnp.zeros((1, 128), jnp.float32)
            for k, val in pairs:
                acc = acc + jnp.where(lane == k, val, 0.0)
            return acc

        macc_ref[...] = macc_ref[...] + _lanes(
            [
                (0, jnp.sum(pg_min)),
                (1, jnp.sum(verr * verr)),
                (2, jnp.sum(old_logp - logp)),
            ]
        )

        # ---- backward
        # d total / d pg_min_i = -1/mb. Inside the clip band pg1 == pg2 and
        # lax.min splits the cotangent 50/50 (which sums back to the plain
        # term); outside, the smaller branch takes it all.
        inband = ((ratio >= lo_c) & (ratio <= hi_c)).astype(jnp.float32)
        d1 = adv_n
        d2 = adv_n * inband
        dmin_dr = jnp.where(
            pg1 == pg2, 0.5 * (d1 + d2), jnp.where(pg1 < pg2, d1, d2)
        )
        g_logp = (-inv_mb) * dmin_dr * ratio  # (chunk, 1)

        dmean = g_logp * (diff / var)  # (chunk, act_dim)
        g_logstd = jnp.sum(
            g_logp * (diff * diff / var - 1.0), axis=0, keepdims=True
        ) - entropy_coef * (float(chunk) * inv_mb)
        if log_std_range is not None:
            ls_p = leaves[i_log_std]
            g_logstd = g_logstd * (
                (ls_p > log_std_range[0]) & (ls_p < log_std_range[1])
            ).astype(jnp.float32)
        dvalue = (value_coef * inv_mb) * verr  # (chunk, 1)

        g = [None] * n_leaves
        g[i_pi_head] = _mm_tn(a_pi[-1], dmean)
        g[i_pi_head + 1] = jnp.sum(dmean, axis=0, keepdims=True)
        g[i_log_std] = g_logstd
        da = _mm_nt(dmean, leaves[i_pi_head])
        for i in range(n_pi - 1, -1, -1):
            a_i = a_pi[i + 1]
            dz = da * (1.0 - a_i * a_i)
            g[2 * i] = _mm_tn(a_pi[i], dz)
            g[2 * i + 1] = jnp.sum(dz, axis=0, keepdims=True)
            if i > 0:
                da = _mm_nt(dz, leaves[2 * i])

        g[i_vf_head] = _mm_tn(a_vf[-1], dvalue)
        g[i_vf_head + 1] = jnp.sum(dvalue, axis=0, keepdims=True)
        da = _mm_nt(dvalue, leaves[i_vf_head])
        for i in range(n_vf - 1, -1, -1):
            a_i = a_vf[i + 1]
            dz = da * (1.0 - a_i * a_i)
            g[i_vf0 + 2 * i] = _mm_tn(a_vf[i], dz)
            g[i_vf0 + 2 * i + 1] = jnp.sum(dz, axis=0, keepdims=True)
            if i > 0:
                da = _mm_nt(dz, leaves[i_vf0 + 2 * i])

        for i in range(n_leaves):
            gacc[i][...] = gacc[i][...] + g[i]

        # ---- last chunk: global-norm clip + Adam + metrics row
        @pl.when(ck == n_chunks - 1)
        def _update():
            grads = [gacc[i][...] for i in range(n_leaves)]
            sq = None
            for gi in grads:
                s = jnp.sum(gi * gi)
                sq = s if sq is None else sq + s
            gnorm = jnp.sqrt(sq)
            scale = jnp.where(
                gnorm < max_grad_norm, 1.0, max_grad_norm / gnorm
            )
            # b**t as exp(t*ln b): math.powf does not legalize on Mosaic
            t = (t0_ref[0] + mb + 1).astype(jnp.float32)
            c1 = 1.0 - jnp.exp(t * float(np.log(_B1)))
            c2 = 1.0 - jnp.exp(t * float(np.log(_B2)))
            for i in range(n_leaves):
                gi = grads[i] * scale
                m_new = _B1 * out_mu[i][...] + (1.0 - _B1) * gi
                v_new = _B2 * out_nu[i][...] + (1.0 - _B2) * (gi * gi)
                out_mu[i][...] = m_new
                out_nu[i][...] = v_new
                upd = (m_new / c1) / (jnp.sqrt(v_new / c2) + _EPS)
                out_leaves[i][...] = out_leaves[i][...] - learning_rate * upd

            macc = macc_ref[...]
            pg_loss = -macc[0, 0] * inv_mb
            v_loss = 0.5 * macc[0, 1] * inv_mb
            kl = macc[0, 2] * inv_mb
            # entropy is reported from the PRE-update log_std like the XLA
            # path -> the forward's clipped log_std captured above
            ent_m = jnp.sum(log_std + _ENT_C)
            total = pg_loss + value_coef * v_loss - entropy_coef * ent_m
            row = _lanes(
                [(0, total), (1, pg_loss), (2, v_loss), (3, ent_m), (4, kl)]
            )
            # whole (num_minibatches, 128) metrics array stays resident
            # (Mosaic needs sublane-divisible or full blocks); write row mb
            metrics_ref[pl.ds(mb, 1), :] = row

    const2 = lambda *_: (0, 0)  # noqa: E731

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # adv_stats, t0
        grid=(num_minibatches, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, feat), lambda mb, ck, *s: (mb, ck, 0)),
            *[pl.BlockSpec(s, const2) for s in leaf_shapes],  # params
            *[pl.BlockSpec(s, const2) for s in leaf_shapes],  # mu
            *[pl.BlockSpec(s, const2) for s in leaf_shapes],  # nu
        ],
        out_specs=[
            *[pl.BlockSpec(s, const2) for s in leaf_shapes],
            *[pl.BlockSpec(s, const2) for s in leaf_shapes],
            *[pl.BlockSpec(s, const2) for s in leaf_shapes],
            pl.BlockSpec((num_minibatches, 128), const2),
        ],
        scratch_shapes=[
            *[pltpu.VMEM(s, jnp.float32) for s in leaf_shapes],  # grad acc
            pltpu.VMEM((1, 128), jnp.float32),  # metric partial sums
        ],
    )

    out_shapes = (
        *[jax.ShapeDtypeStruct(s, jnp.float32) for s in leaf_shapes],
        *[jax.ShapeDtypeStruct(s, jnp.float32) for s in leaf_shapes],
        *[jax.ShapeDtypeStruct(s, jnp.float32) for s in leaf_shapes],
        jax.ShapeDtypeStruct((num_minibatches, 128), jnp.float32),
    )

    kwargs = {}
    if not interpret:
        # the resident params/moments + per-chunk activations exceed the
        # default 16MB scoped-vmem budget at chunk>=512; v5e has 128MB
        # physical VMEM, so raise the cap instead of shrinking the chunk
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    call = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
        **kwargs,
    )

    def run(mbs, adv_stats, t0, leaves, mu, nu):
        outs = call(adv_stats, t0, mbs, *leaves, *mu, *nu)
        new_leaves = list(outs[:n_leaves])
        new_mu = list(outs[n_leaves : 2 * n_leaves])
        new_nu = list(outs[2 * n_leaves : 3 * n_leaves])
        metrics = outs[3 * n_leaves][:, : len(METRICS)]
        return new_leaves, new_mu, new_nu, metrics

    return run
