"""Headline benchmark: env-steps/s at 8192 QuadX-Hover instances on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md); the recorded
north-star target is ≥10M env-steps/s at 8192 envs on one TPU v5e chip, so
``vs_baseline`` is reported relative to that target.
"""

import json
import time

import jax
import jax.numpy as jnp

from pyflyt_tpu.envs.packed_hover import (
    PackedQuadXHoverEnv,
    packed_autoreset_init,
    packed_cached_autoreset_step,
)
from pyflyt_tpu.envs.quadx_hover import QuadXHoverEnv

NUM_ENVS = 8192
STEPS_PER_CHUNK = 512  # long chunks amortize per-dispatch latency
TARGET_ENV_STEPS_PER_S = 10_000_000.0  # BASELINE.json north star


def check_mosaic_parity(n=256, steps=3, atol=2e-4):
    """Real-lowering parity gate: the CPU test suite only exercises the
    kernel under ``interpret=True``, so this asserts — on the actual chip,
    noise off — that the Mosaic-lowered fused agent step tracks the XLA
    pipeline (obs/reward/flags) before any number is reported. Raises (and
    thereby fails the bench loudly) on divergence."""
    import numpy as np

    from pyflyt_tpu.envs.base import vec_reset

    base = QuadXHoverEnv(noisy_motors=False)
    penv = PackedQuadXHoverEnv(base=base)
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    ref_st, _ = vec_reset(base, keys)
    pk_st, _ = penv.reset(keys)
    vstep = jax.jit(jax.vmap(base.step))
    pstep = jax.jit(penv.step)
    action = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.42]), (n, 1))
    for i in range(steps):
        ref_st, ref_out = vstep(ref_st, action)
        pk_st, out = pstep(pk_st, action)
        np.testing.assert_allclose(
            np.asarray(out.obs), np.asarray(ref_out.obs), atol=atol,
            err_msg=f"Mosaic/XLA obs divergence at step {i}",
        )
        np.testing.assert_allclose(
            np.asarray(out.reward), np.asarray(ref_out.reward), atol=atol,
            err_msg=f"Mosaic/XLA reward divergence at step {i}",
        )
        np.testing.assert_array_equal(
            np.asarray(out.termination), np.asarray(ref_out.termination),
            err_msg=f"Mosaic/XLA termination divergence at step {i}",
        )


def main():
    # the fused-kernel hover env (envs/packed_hover.py): the whole agent
    # step — 3 aviary steps + reward/termination/freeze — is one Pallas
    # kernel on the (ROWS, 8, N/8) packed state; parity with the XLA
    # pipeline is asserted in tests/test_packed_hover.py (interpret mode)
    # and by check_mosaic_parity above (real TPU lowering, every run).
    # The pure-XLA path (QuadXHoverEnv + cached_autoreset_step) measures
    # 27.3M on this bench.
    check_mosaic_parity()
    env = PackedQuadXHoverEnv(base=QuadXHoverEnv())
    keys = jax.random.split(jax.random.PRNGKey(0), NUM_ENVS)
    # cached auto-reset: the reset work runs once every `refresh` steps
    # instead of for the whole batch every step (envs/base.py)
    state, _ = jax.jit(lambda k: packed_autoreset_init(env, k))(keys)

    hover_t = float(jnp.sqrt(0.027 * 9.81 / 2.0))

    @jax.jit
    def rollout_chunk(state, key):
        def body(carry, _):
            st, key = carry
            key, sub = jax.random.split(key)
            # cheap stochastic policy: hover action + exploration noise
            action = jnp.asarray([0.0, 0.0, 0.0, hover_t]) + 0.1 * jax.random.normal(
                sub, (NUM_ENVS, 4)
            )
            st, out = packed_cached_autoreset_step(env, st, action, refresh=64)
            return (st, key), out.reward

        (state, key), rewards = jax.lax.scan(
            body, (state, key), None, length=STEPS_PER_CHUNK
        )
        return state, key, rewards.sum()

    key = jax.random.PRNGKey(1)
    # warmup / compile
    state, key, _ = rollout_chunk(state, key)
    jax.block_until_ready(state)

    n_chunks = 4
    t0 = time.perf_counter()
    total = 0.0
    for _ in range(n_chunks):
        state, key, rsum = rollout_chunk(state, key)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    env_steps = NUM_ENVS * STEPS_PER_CHUNK * n_chunks
    steps_per_s = env_steps / dt
    print(
        json.dumps(
            {
                "metric": f"QuadX-Hover env-steps/s ({NUM_ENVS} envs, 1 chip)",
                "value": round(steps_per_s),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / TARGET_ENV_STEPS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
