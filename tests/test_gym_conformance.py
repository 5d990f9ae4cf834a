"""Gymnasium API conformance over every registered env.

The reference gates all envs through ``gymnasium.utils.env_checker.check_env``
(tests/test_gym_envs.py:105-130); this is the same sweep over our
registrations.
"""

import warnings

import numpy as np
import pytest

import gymnasium
from gymnasium.utils.env_checker import check_env

from pyflyt_tpu.envs.gym_wrapper import register_envs

register_envs()

ENV_CONFIGS = [
    ("PyFlyt/QuadX-Hover-v1", {}),
    ("PyFlyt/QuadX-Hover-v1", {"sparse_reward": True}),
    ("PyFlyt/QuadX-Hover-v1", {"angle_representation": "euler"}),
    ("PyFlyt/QuadX-Waypoints-v1", {}),
    ("PyFlyt/QuadX-Waypoints-v1", {"use_yaw_targets": True}),
    ("PyFlyt/QuadX-Gates-v1", {"camera_resolution": (32, 32)}),
    ("PyFlyt/Fixedwing-Waypoints-v1", {}),
    ("PyFlyt/Rocket-Landing-v1", {}),
]


@pytest.mark.parametrize("env_id,kwargs", ENV_CONFIGS)
def test_check_env(env_id, kwargs):
    env = gymnasium.make(env_id, **kwargs)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        check_env(env.unwrapped, skip_render_check=True)
    env.close()


@pytest.mark.parametrize("env_id,kwargs", ENV_CONFIGS[:1] + ENV_CONFIGS[3:4])
def test_seeded_determinism_via_gymnasium(env_id, kwargs):
    """Two instances, same seed, same sampled actions ⇒ identical transitions
    (tests/test_gym_envs.py:133-153)."""
    def rollout(seed):
        env = gymnasium.make(env_id, **kwargs)
        obs, _ = env.reset(seed=seed)
        env.action_space.seed(seed)
        rows = [obs]
        for _ in range(20):
            obs, rew, term, trunc, _ = env.step(env.action_space.sample())
            rows.append((obs, rew, term, trunc))
            if term or trunc:
                break
        env.close()
        return rows

    a, b = rollout(42), rollout(42)
    assert len(a) == len(b)
    for ra, rb in zip(a[1:], b[1:]):
        oa, rwa, ta, tra = ra
        ob, rwb, tb, trb = rb
        if isinstance(oa, dict):
            for k in oa:
                np.testing.assert_array_equal(oa[k], ob[k])
        else:
            np.testing.assert_array_equal(oa, ob)
        assert rwa == rwb and ta == tb and tra == trb
