"""PettingZoo ParallelEnv compatibility shim over the functional MA envs.

Mirrors the reference's multi-agent API
(/root/reference/PyFlyt/pz_envs/quadx_envs/ma_quadx_base_env.py:13,307): dict
actions in, dict observations/rewards/terminations/truncations/infos out,
with dead agents culled from ``self.agents`` after each step
(ma_quadx_base_env.py:361-366). The fast path remains the functional core
(fixed agent axis + alive mask) — this shim is for parity testing and
drop-in use.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

try:
    from gymnasium import spaces
    from pettingzoo import ParallelEnv
except ImportError:  # pragma: no cover
    ParallelEnv = object
    spaces = None


class PettingZooEnv(ParallelEnv):
    """Wraps a functional MA env (MAQuadXHoverEnv / MAFixedwingDogfightEnv)."""

    metadata = {"render_modes": ["rgb_array"], "name": "pyflyt_tpu_ma_env"}

    def __init__(self, fenv, render_mode: str | None = None):
        self.fenv = fenv
        self.render_mode = render_mode
        self.render_resolution = (480, 480)
        self._jit_render = None
        self.possible_agents = list(fenv.possible_agents)
        self.agent_name_mapping = {
            a: i for i, a in enumerate(self.possible_agents)
        }
        self.agents = []

        low, high = fenv.action_bounds()
        self._action_space = spaces.Box(
            low=low.astype(np.float64), high=high.astype(np.float64),
            dtype=np.float64,
        )
        self._observation_space = spaces.Box(
            low=-np.inf, high=np.inf, shape=(fenv.obs_size,), dtype=np.float64
        )

        self._jit_reset = jax.jit(fenv.reset)
        self._jit_step = jax.jit(fenv.step)
        self._state = None
        self._np_random = np.random.default_rng()

    def observation_space(self, agent: Any = None):
        return self._observation_space

    def action_space(self, agent: Any = None):
        return self._action_space

    def reset(self, seed: int | None = None, options: dict | None = None):
        if seed is None:
            seed = int(self._np_random.integers(0, 2**31 - 1))
        self._np_random = np.random.default_rng(seed)
        self._state, obs = self._jit_reset(jax.random.PRNGKey(seed))
        self.agents = self.possible_agents[:]
        obs = np.asarray(obs, dtype=np.float64)
        observations = {
            a: obs[self.agent_name_mapping[a]] for a in self.agents
        }
        infos = {a: {} for a in self.agents}
        return observations, infos

    def step(self, actions: dict[str, np.ndarray]):
        n = len(self.possible_agents)
        act = np.zeros((n, self.fenv.action_size), dtype=np.float64)
        for k, v in actions.items():
            act[self.agent_name_mapping[k]] = v
        self._state, out = self._jit_step(self._state, jnp.asarray(act))

        obs = np.asarray(out.obs, dtype=np.float64)
        rew = np.asarray(out.reward, dtype=np.float64)
        term = np.asarray(out.termination)
        trunc = np.asarray(out.truncation)
        info_np = {
            k: np.asarray(v) for k, v in out.info.items()
        }

        observations, rewards, terminations, truncations, infos = (
            {}, {}, {}, {}, {},
        )
        for a in self.agents:
            i = self.agent_name_mapping[a]
            observations[a] = obs[i]
            rewards[a] = float(rew[i])
            terminations[a] = bool(term[i])
            truncations[a] = bool(trunc[i])
            infos[a] = {
                k: v[i].item() if v.ndim == 1 else v[i]
                for k, v in info_np.items()
            }

        # cull dead agents for the next round (ma_quadx_base_env.py:361-366)
        self.agents = [
            a for a in self.agents if not (terminations[a] or truncations[a])
        ]
        return observations, rewards, terminations, truncations, infos

    def render(self):
        """``rgb_array`` overview render of all agents (HxWx4 uint8).

        The reference MA envs render through PyBullet's visualizer
        (ma_quadx_base_env.py render plumbing); here every alive agent is an
        oriented body box plus whatever the env exposes via ``scene_boxes``
        (e.g. the dogfight's hit-recolored gunsights,
        ma_fixedwing_dogfight_env.py:383-394), ray-cast from a fixed-yaw
        camera that tracks the agents' centroid."""
        assert self.render_mode is not None, (
            "Please set `render_mode='rgb_array'` to use this function."
        )
        from pyflyt_tpu.core import camera as cam
        from pyflyt_tpu.core import math as pm

        if self._jit_render is None:
            half_extents = getattr(
                self.fenv, "render_half_extents", (0.7, 1.25, 0.1)
            )
            n = len(self.possible_agents)

            def _render(state):
                view = state.drones.read.view  # (n, 4, 3)
                body = cam.Boxes(
                    centers=view[:, 3],
                    half_extents=jnp.broadcast_to(
                        jnp.asarray(list(half_extents)), (n, 3)
                    ),
                    rotations=pm.euler_to_rotmat(view[:, 1]),
                    colors=jnp.asarray(
                        [[0.9, 0.1, 0.1, 1.0], [0.1, 0.1, 0.9, 1.0]]
                    )[jnp.arange(n) % 2],
                    visible=state.alive,
                )
                boxes = body
                if hasattr(self.fenv, "scene_boxes"):
                    boxes = cam.concat_boxes(boxes, self.fenv.scene_boxes(state))
                centroid = jnp.mean(view[:, 3], axis=0)
                spread = jnp.max(
                    jnp.linalg.norm(view[:, 3] - centroid, axis=-1)
                )
                dist = jnp.maximum(3.0 * spread, 10.0)
                eye = centroid + jnp.stack(
                    [-dist, 0.0 * dist, 0.6 * dist]
                )
                up = jnp.asarray([0.0, 0.0, 1.0])
                origin, dirs = cam.camera_rays_tracking(
                    eye, centroid, up, self.render_resolution, 60.0
                )
                rgba, _, _ = cam.render(origin, dirs, boxes)
                return rgba

            self._jit_render = jax.jit(_render)
        return np.asarray(self._jit_render(self._state))

    def close(self):
        pass


def make_ma_quadx_hover(render_mode=None, **kwargs) -> "PettingZooEnv":
    from pyflyt_tpu.envs.ma_quadx_hover import MAQuadXHoverEnv

    return PettingZooEnv(MAQuadXHoverEnv(**kwargs), render_mode)


def make_ma_fixedwing_dogfight(render_mode=None, **kwargs) -> "PettingZooEnv":
    from pyflyt_tpu.envs.ma_fixedwing_dogfight import MAFixedwingDogfightEnv

    return PettingZooEnv(MAFixedwingDogfightEnv(**kwargs), render_mode)
