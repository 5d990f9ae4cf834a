"""Functional environment protocol + batching/auto-reset helpers.

The reference's Gymnasium envs rebuild the whole PyBullet Aviary every episode
(/root/reference/PyFlyt/gym_envs/quadx_envs/quadx_base_env.py:140-191). Here
``reset`` is a pure function of a PRNG key and ``step`` a pure transition, so
auto-resetting vectorized rollouts run entirely on-device under one jit.
"""

from __future__ import annotations

from typing import Any, Protocol

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array


@struct.dataclass
class StepOut:
    """Transition outputs (all batched like the state)."""

    obs: Any  # Array or dict of Arrays
    reward: Array
    termination: Array
    truncation: Array
    info: dict[str, Array]


class FunctionalEnv(Protocol):
    """Structural type implemented by every env module."""

    def reset(self, key: Array) -> tuple[Any, Any]: ...

    def step(self, state: Any, action: Array) -> tuple[Any, StepOut]: ...


def tree_select(mask: Array, on_true: Any, on_false: Any) -> Any:
    """Broadcasting ``where`` over matching pytrees (mask has batch shape)."""
    def pick(t, f):
        m = mask.reshape(mask.shape + (1,) * (jnp.ndim(f) - mask.ndim))
        return jnp.where(m, t, f)

    return jax.tree.map(pick, on_true, on_false)


# ---------------------------------------------------------------------------
# vectorization + auto-reset
# ---------------------------------------------------------------------------


def vec_reset(env: FunctionalEnv, keys: Array) -> tuple[Any, Any]:
    """Resets a batch of env instances from a batch of keys."""
    return jax.vmap(env.reset)(keys)


def vec_step(env: FunctionalEnv, state: Any, action: Array) -> tuple[Any, StepOut]:
    """Steps a batch of env instances."""
    return jax.vmap(env.step)(state, action)


def autoreset_step(
    env: FunctionalEnv, state: Any, action: Array
) -> tuple[Any, StepOut]:
    """Vectorized step with masked auto-reset on termination|truncation.

    Replaces SB3's SubprocVecEnv episode handling
    (/root/reference/PyFlyt/rl_training/hovering/training.py:159-164):
    finished instances are reset in-place with fresh PRNG streams; the
    returned ``StepOut`` reflects the *pre-reset* transition (standard vec-env
    convention: the final obs of an episode is replaced by the next episode's
    initial obs, and reward/term/trunc describe the finished transition).
    """
    state, out = jax.vmap(env.step)(state, action)
    done = out.termination | out.truncation

    reset_keys = jax.vmap(lambda s: jax.random.fold_in(s.key, 1))(state)
    reset_state, reset_obs = jax.vmap(env.reset)(reset_keys)

    def pick(new, old):
        mask = done.reshape(done.shape + (1,) * (jnp.ndim(old) - done.ndim))
        return jnp.where(mask, new, old)

    state = jax.tree.map(pick, reset_state, state)
    obs = jax.tree.map(pick, reset_obs, out.obs)
    return state, out.replace(obs=obs)
