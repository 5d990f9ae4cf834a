"""Fork-modified QuadX envs (normalized obs/actions, shaped rewards).

Re-implements /root/reference/PyFlyt/gym_envs/quadx_mod_envs/: the RL
training environments the fork's PPO pipelines consume (rl_training/).
"""

from pyflyt_tpu.envs.quadx_mod.hovering import QuadXModHoveringEnv  # noqa: F401
from pyflyt_tpu.envs.quadx_mod.pid_expert import (  # noqa: F401
    hovering_pid_expert,
    trajectory_pid_expert,
)
from pyflyt_tpu.envs.quadx_mod.trajectory_following_fast import (  # noqa: F401
    QuadXTrajectoryFollowingFastEnv,
)
from pyflyt_tpu.envs.quadx_mod.trajectory_following_slow import (  # noqa: F401
    QuadXTrajectoryFollowingSlowEnv,
)
