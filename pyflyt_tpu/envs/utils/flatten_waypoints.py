"""Waypoint-observation flattening.

Re-implements /root/reference/PyFlyt/gym_envs/utils/flatten_waypoint_env.py:
concatenate the attitude vector with the first ``context_length`` remaining
target deltas (zero-padded). Our fixed-shape target buffer is already rolled
+ zero-padded (envs/utils/waypoints.py:remaining_deltas), so flattening is a
slice + concat — jit/vmap friendly.

NOTE: the reference declares a Box of ``attitude + target_shape`` but emits
``attitude + context_length·target_shape`` values (flatten_waypoint_env.py:
30-47); we declare the actual emitted size.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def flatten_waypoint_obs(obs: dict, context_length: int = 2) -> Array:
    """{"attitude": (..., A), "target_deltas": (..., N, K)} → (..., A + C·K),
    zero-padded when ``context_length`` exceeds the target count
    (flatten_waypoint_env.py:41-45)."""
    deltas = obs["target_deltas"]
    n = deltas.shape[-2]
    if context_length > n:
        pad = [(0, 0)] * (deltas.ndim - 2) + [(0, context_length - n), (0, 0)]
        deltas = jnp.pad(deltas, pad)
    deltas = deltas[..., :context_length, :]
    flat = deltas.reshape(*deltas.shape[:-2], -1)
    return jnp.concatenate([obs["attitude"], flat], axis=-1)


class FlattenWaypointEnv:
    """Functional-env wrapper flattening dict observations."""

    def __init__(self, env, context_length: int = 2):
        assert hasattr(env, "waypoints"), (
            "Only a waypoints environment can be used with `FlattenWaypointEnv`."
        )
        self.env = env
        self.context_length = context_length

    def __getattr__(self, name):
        return getattr(self.env, name)

    @property
    def obs_size(self) -> int:
        return (
            self.env.combined_size
            + self.context_length * self.env.waypoints.delta_size
        )

    def observation_space_factory(self, spaces):
        import numpy as np

        return spaces.Box(
            low=-np.inf, high=np.inf, shape=(self.obs_size,), dtype=np.float64
        )

    def reset(self, key):
        state, obs = self.env.reset(key)
        return state, flatten_waypoint_obs(obs, self.context_length)

    def step(self, state, action):
        state, out = self.env.step(state, action)
        return state, out.replace(
            obs=flatten_waypoint_obs(out.obs, self.context_length)
        )

    def action_bounds(self):
        return self.env.action_bounds()
