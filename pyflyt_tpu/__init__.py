"""PyFlyt-TPU: a TPU-native UAV flight simulation suite for RL research.

A from-scratch rebuild of the capabilities of PyFlyt (reference:
/root/reference, a PyBullet-based UAV simulator) as a batched, pure-JAX
flight-dynamics engine designed for TPU:

- state lives in pytrees, physics is pure functions (`jit`/`vmap`/`scan`)
- thousands of simulation instances step in lockstep on one chip
- multi-chip scaling via `jax.sharding.Mesh` + `shard_map`
- Gymnasium / PettingZoo compatibility shims wrap the functional core

Subpackages:
    core      math, rigid-body integrator, state pytrees, wind fields
    ops       physics component operators (motors, aero surfaces, boosters, ...)
    models    vehicle dynamics + control cascades (QuadX, Fixedwing, Rocket)
    envs      functional task environments + Gymnasium wrappers
    pz        multi-agent (parallel) environments + PettingZoo wrappers
    rl        PPO training stack (pure JAX)
    parallel  device-mesh sharding utilities
"""

__version__ = "0.1.0"
