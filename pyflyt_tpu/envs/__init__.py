"""Functional task environments + Gymnasium compatibility wrappers.

Environment IDs mirror the reference registrations
(/root/reference/PyFlyt/gym_envs/__init__.py:7-30):

- ``PyFlyt/QuadX-Hover-v1``
- ``PyFlyt/QuadX-Waypoints-v1``
- ``PyFlyt/Fixedwing-Waypoints-v1``
- ``PyFlyt/Rocket-Landing-v1``

The functional API is the fast path::

    env = QuadXHoverEnv()
    state, obs = env.reset(key)
    state, out = env.step(state, action)   # out: obs, reward, term, trunc, info

All methods are pure and jit/vmap/scan-composable; batching is `vmap` over the
reset keys.
"""

from pyflyt_tpu.envs.base import (  # noqa: F401
    AutoResetState,
    StepOut,
    autoreset_init,
    autoreset_step,
    cached_autoreset_step,
    vec_reset,
    vec_step,
)
from pyflyt_tpu.envs.quadx_hover import QuadXHoverEnv  # noqa: F401
from pyflyt_tpu.envs.quadx_waypoints import QuadXWaypointsEnv  # noqa: F401
from pyflyt_tpu.envs.quadx_gates import QuadXGatesEnv  # noqa: F401
from pyflyt_tpu.envs.fixedwing_waypoints import FixedwingWaypointsEnv  # noqa: F401
from pyflyt_tpu.envs.rocket_landing import RocketLandingEnv  # noqa: F401
from pyflyt_tpu.envs.ma_quadx_hover import MAQuadXHoverEnv  # noqa: F401
from pyflyt_tpu.envs.ma_fixedwing_dogfight import MAFixedwingDogfightEnv  # noqa: F401
