"""QuadX Hover task.

Functional re-implementation of
/root/reference/PyFlyt/gym_envs/quadx_envs/quadx_hover_env.py: hover at
[0, 0, 1] for as long as possible; dense reward
``−0.1 − ‖pos − (0,0,1)‖ − ‖(roll, pitch)‖ + 1`` accumulated per inner aviary
step (quadx_hover_env.py:105-119), −100 on collision / leaving the dome.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import Array

from pyflyt_tpu.envs.base import StepOut
from pyflyt_tpu.envs.quadx_base import QuadXBaseEnv, QuadXEnvState


@dataclasses.dataclass(frozen=True)
class QuadXHoverEnv(QuadXBaseEnv):
    sparse_reward: bool = False
    flight_dome_size: float = 3.0
    agent_hz: int = 40

    @property
    def obs_size(self) -> int:
        return self.combined_size

    def reset(self, key: Array) -> tuple[QuadXEnvState, Array]:
        state = self.init_env_state(key)
        return state, self.attitude_obs(state)

    def _task_update(self, state: QuadXEnvState, contact: Array) -> QuadXEnvState:
        state = self.base_term_trunc_reward(state, contact)
        if self.sparse_reward:
            return state
        view = state.drone.read.view
        lin_pos = view[..., 3, :]
        target = jnp.asarray([0.0, 0.0, 1.0], dtype=lin_pos.dtype)
        linear_distance = jnp.linalg.norm(lin_pos - target, axis=-1)
        angular_distance = jnp.linalg.norm(view[..., 1, :2], axis=-1)
        reward = state.reward - linear_distance - angular_distance + 1.0
        return state.replace(reward=reward)

    def step(self, state: QuadXEnvState, action: Array) -> tuple[QuadXEnvState, StepOut]:
        return self.base_step(state, action, self._task_update, self.attitude_obs)
