"""Hovering PID expert policy.

Port of /root/reference/PyFlyt/gym_envs/quadx_mod_envs/hovering/
quadx_hovering_pid_expert.py:20-37: reads the UNNORMALIZED 16-dim hovering
observation and emits a mode-7/10 setpoint ``[x, y, psi, z]`` pointing at the
target (position + error). This is the classical-control baseline the fork
compares RL policies against (examples/evaluation/results.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from pyflyt_tpu.core import math as pm


def hovering_pid_expert(observation: Array) -> Array:
    """(…, 16) unnormalized hovering obs → (…, 4) mode-7/10 setpoint."""
    target_pos = observation[..., 0:3] + observation[..., 12:15]
    target_psi = pm.wrap_angle(observation[..., 8] + observation[..., 15])
    return jnp.stack(
        [
            target_pos[..., 0],
            target_pos[..., 1],
            target_psi,
            target_pos[..., 2],
        ],
        axis=-1,
    )


def trajectory_pid_expert(observation: Array) -> Array:
    """(…, 16) unnormalized trajectory-following obs → (…, 4) mode-10
    setpoint.

    Port of /root/reference/PyFlyt/gym_envs/quadx_mod_envs/
    trajectory_following_slow/quadx_trajectory_following_pid_expert.py:20-35 —
    the slow-variant obs shares the hovering layout ([lin_pos, lin_vel,
    ang_pos, ang_vel, pos_err, yaw_err]), so the expert is the same
    position-plus-error passthrough (the reference duplicates the class; we
    alias it)."""
    return hovering_pid_expert(observation)
