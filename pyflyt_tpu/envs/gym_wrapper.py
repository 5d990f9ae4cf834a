"""Gymnasium compatibility shim over the functional envs.

Single-instance adapter for parity testing and drop-in use where the reference
envs were used (/root/reference/PyFlyt/gym_envs/). The fast path is the
functional API (vmapped + scanned on device); this wrapper jits the single-env
reset/step once and round-trips numpy at the boundary.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium
    from gymnasium import spaces
except ImportError:  # pragma: no cover - gymnasium is an optional dependency
    gymnasium = None


def _require_gymnasium():
    if gymnasium is None:
        raise ImportError("gymnasium is required for the Gymnasium wrapper")


class GymnasiumEnv(gymnasium.Env if gymnasium else object):
    """Wraps a FunctionalEnv into the Gymnasium API."""

    metadata = {"render_modes": [], "render_fps": 30}

    def __init__(self, fenv, render_mode: str | None = None):
        _require_gymnasium()
        self.fenv = fenv
        self.render_mode = render_mode

        low, high = fenv.action_bounds()
        self.action_space = spaces.Box(
            low=low.astype(np.float64), high=high.astype(np.float64),
            dtype=np.float64,
        )
        self.observation_space = self._build_observation_space()

        self._jit_reset = jax.jit(fenv.reset)
        self._jit_step = jax.jit(fenv.step)
        self._state = None

    def _build_observation_space(self):
        if hasattr(self.fenv, "observation_space_factory"):
            return self.fenv.observation_space_factory(spaces)
        return spaces.Box(
            low=-np.inf, high=np.inf, shape=(self.fenv.obs_size,), dtype=np.float64
        )

    def reset(self, *, seed: int | None = None, options: dict | None = None):
        super().reset(seed=seed)
        if seed is None:
            seed = int(self.np_random.integers(0, 2**31 - 1))
        key = jax.random.PRNGKey(seed)
        self._state, obs = self._jit_reset(key)
        return self._to_numpy(obs), {}

    def step(self, action):
        self._state, out = self._jit_step(self._state, jnp.asarray(action))
        info = {
            k: bool(v) if np.asarray(v).dtype == np.bool_ else np.asarray(v).item()
            for k, v in out.info.items()
        }
        return (
            self._to_numpy(out.obs),
            float(out.reward),
            bool(out.termination),
            bool(out.truncation),
            info,
        )

    @staticmethod
    def _to_numpy(obs: Any):
        def conv(v):
            v = np.asarray(v)
            # keep integer image dtypes (e.g. the gates env's uint8 camera)
            return v if np.issubdtype(v.dtype, np.integer) else v.astype(np.float64)

        if isinstance(obs, dict):
            return {k: conv(v) for k, v in obs.items()}
        return conv(obs)

    def close(self):
        pass


def register_envs():
    """Registers the PyFlyt/... env IDs with Gymnasium (mirrors
    /root/reference/PyFlyt/gym_envs/__init__.py:7-30)."""
    _require_gymnasium()
    from gymnasium.envs.registration import register, registry

    def _register(env_id, entry_point, **kwargs):
        if env_id not in registry:
            register(id=env_id, entry_point=entry_point, kwargs=kwargs)

    _register(
        "PyFlyt/QuadX-Hover-v1", "pyflyt_tpu.envs.gym_wrapper:_make_hover"
    )
    _register(
        "PyFlyt/QuadX-Waypoints-v1", "pyflyt_tpu.envs.gym_wrapper:_make_quadx_waypoints"
    )
    _register(
        "PyFlyt/QuadX-Gates-v1", "pyflyt_tpu.envs.gym_wrapper:_make_quadx_gates"
    )
    _register(
        "PyFlyt/Fixedwing-Waypoints-v1",
        "pyflyt_tpu.envs.gym_wrapper:_make_fixedwing_waypoints",
    )
    _register(
        "PyFlyt/Rocket-Landing-v1", "pyflyt_tpu.envs.gym_wrapper:_make_rocket_landing"
    )


def _make_hover(render_mode=None, **kwargs):
    from pyflyt_tpu.envs.quadx_hover import QuadXHoverEnv

    return GymnasiumEnv(QuadXHoverEnv(**kwargs), render_mode)


def _make_quadx_waypoints(render_mode=None, **kwargs):
    from pyflyt_tpu.envs.quadx_waypoints import QuadXWaypointsEnv

    return GymnasiumEnv(QuadXWaypointsEnv(**kwargs), render_mode)


def _make_quadx_gates(render_mode=None, **kwargs):
    from pyflyt_tpu.envs.quadx_gates import QuadXGatesEnv

    return GymnasiumEnv(QuadXGatesEnv(**kwargs), render_mode)


def _make_fixedwing_waypoints(render_mode=None, **kwargs):
    from pyflyt_tpu.envs.fixedwing_waypoints import FixedwingWaypointsEnv

    return GymnasiumEnv(FixedwingWaypointsEnv(**kwargs), render_mode)


def _make_rocket_landing(render_mode=None, **kwargs):
    from pyflyt_tpu.envs.rocket_landing import RocketLandingEnv

    return GymnasiumEnv(RocketLandingEnv(**kwargs), render_mode)
