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

    metadata = {"render_modes": ["rgb_array"], "render_fps": 30}

    def __init__(
        self,
        fenv,
        render_mode: str | None = None,
        render_resolution: tuple[int, int] = (480, 480),
    ):
        _require_gymnasium()
        self.fenv = fenv
        self.render_mode = render_mode
        self.render_resolution = render_resolution
        self._jit_render = None

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

    def render(self):
        """``rgb_array`` render: a chase-camera ray-cast view of the vehicle
        (reference contract: HxWx4 uint8 — tests/test_gym_envs.py:174-196).

        The reference renders through PyBullet's debug visualizer
        (quadx_base_env.py:281-299); here the scene (ground + vehicle box +
        any task geometry the env exposes via ``scene_boxes``) goes through
        the on-device ray caster.
        """
        assert self.render_mode is not None, (
            "Please set `render_mode='rgb_array'` to use this function."
        )
        import jax
        import jax.numpy as jnp

        from pyflyt_tpu.core import camera as cam
        from pyflyt_tpu.core import math as pm

        if self._jit_render is None:

            half_extents = getattr(
                self.fenv, "render_half_extents", (0.12, 0.12, 0.04)
            )

            def _render(state):
                view = state.drone.read.view
                # vehicle as an oriented box at its pose
                body_box = cam.Boxes(
                    centers=view[3][None, :],
                    half_extents=jnp.asarray([list(half_extents)]),
                    rotations=pm.euler_to_rotmat(view[1])[None],
                    colors=jnp.asarray([[0.9, 0.1, 0.1, 1.0]]),
                    visible=jnp.ones((1,), bool),
                )
                boxes = body_box
                if hasattr(self.fenv, "scene_boxes"):
                    # concat_boxes materializes any shared-rotation
                    # (rot_index) geometry — e.g. the gates env's gate_boxes
                    # — before merging with the plain body box
                    boxes = cam.concat_boxes(boxes, self.fenv.scene_boxes(state))
                # chase camera: behind and above the vehicle, yaw-following
                yaw = view[1][2]
                offset = jnp.stack(
                    [-3.0 * jnp.cos(yaw), -3.0 * jnp.sin(yaw), 1.5]
                )
                eye = view[3] + offset
                to_target = view[3] - eye
                pitch = jnp.arctan2(
                    to_target[2], jnp.linalg.norm(to_target[:2])
                )
                euler = jnp.stack([0.0 * yaw, -pitch, yaw])
                rgba, _, _ = cam.capture_image(
                    eye, euler, boxes, resolution=self.render_resolution,
                    fov_degrees=60.0,
                )
                return rgba

            self._jit_render = jax.jit(_render)
        return np.asarray(self._jit_render(self._state))

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
