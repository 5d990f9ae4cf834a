"""Config-space fuzz: every env family must reset+step across a spread of
constructor configurations without trace errors or NaNs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyflyt_tpu.envs import (
    FixedwingWaypointsEnv,
    QuadXGatesEnv,
    QuadXHoverEnv,
    QuadXWaypointsEnv,
    RocketLandingEnv,
)
from pyflyt_tpu.envs.quadx_mod import (
    QuadXModHoveringEnv,
    QuadXTrajectoryFollowingFastEnv,
    QuadXTrajectoryFollowingSlowEnv,
)

CASES = [
    (QuadXHoverEnv, dict(agent_hz=20, angle_representation="euler")),
    (QuadXHoverEnv, dict(orn_conv="NED_FRD", start_pos=((0.0, 0.0, -1.0),))),
    (QuadXHoverEnv, dict(flight_mode=7, noisy_motors=False)),
    (QuadXWaypointsEnv, dict(num_targets=2, goal_reach_distance=1.0)),
    (QuadXWaypointsEnv, dict(use_yaw_targets=True, agent_hz=60)),
    (QuadXGatesEnv, dict(camera_resolution=(16, 16), num_targets=3)),
    (FixedwingWaypointsEnv, dict(num_targets=2, agent_hz=15)),
    (FixedwingWaypointsEnv, dict(drone_model="acrowing")),
    (RocketLandingEnv, dict(randomize_drop=False, accelerate_drop=False)),
    (RocketLandingEnv, dict(ceiling=200.0, max_displacement=100.0)),
    (QuadXModHoveringEnv, dict(flight_mode=8, control_hz=30)),
    (QuadXModHoveringEnv, dict(flight_mode=10, normalize_obs=False)),
    (QuadXModHoveringEnv, dict(flight_mode=-1, simulate_wind=True)),
    (QuadXTrajectoryFollowingFastEnv, dict(flight_mode=8, control_hz=40,
                                           max_duration_seconds=5.0)),
    (QuadXTrajectoryFollowingSlowEnv, dict(flight_mode=7, control_hz=120,
                                           normalize_actions=False)),
]


@pytest.mark.parametrize("cls,kwargs", CASES)
def test_env_config_fuzz(cls, kwargs):
    env = cls(**kwargs)
    state, obs = env.reset(jax.random.PRNGKey(0))
    low, high = env.action_bounds()
    low = np.nan_to_num(np.asarray(low, dtype=np.float64), neginf=-1.0)
    high = np.nan_to_num(np.asarray(high, dtype=np.float64), posinf=1.0)
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(1)
    for _ in range(5):
        key, sub = jax.random.split(key)
        action = jax.random.uniform(
            sub, (len(low),), minval=jnp.asarray(low), maxval=jnp.asarray(high)
        )
        state, out = step(state, action)
        flat = out.obs if not isinstance(out.obs, dict) else out.obs["attitude"]
        assert np.isfinite(np.asarray(flat, dtype=np.float64)).all()
        assert np.isfinite(float(out.reward))
