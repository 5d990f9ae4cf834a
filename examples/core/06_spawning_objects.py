"""Spawn static scene objects and detect drone-object contact.

TPU-native equivalent of /root/reference/examples/core/06_spawning_objects.py:
the reference loads a duck OBJ into PyBullet and registers it for collision;
here scene objects are oriented boxes (``pyflyt_tpu.core.camera.Boxes``) —
the same geometry the vision envs render — and the Aviary reports
sphere-vs-OBB proximity in ``state.contact``.
"""

import jax
import jax.numpy as jnp

from pyflyt_tpu.core import Aviary, DroneSpec
from pyflyt_tpu.core.camera import Boxes

# a 1 m box hovering at x=2 in the drone's path
obstacle = Boxes(
    centers=jnp.asarray([[2.0, 0.0, 1.0]]),
    half_extents=jnp.asarray([[0.5, 0.5, 0.5]]),
    rotations=jnp.eye(3)[None],
    colors=jnp.asarray([[1.0, 0.8, 0.0, 1.0]]),
    visible=jnp.ones((1,), bool),
)

aviary = Aviary(
    start_pos=[[0.0, 0.0, 1.0]],
    start_orn=[[0.0, 0.0, 0.0]],
    specs=(DroneSpec(drone_type="quadx", mode=7),),
    obstacles=obstacle,
)

state = aviary.reset(jax.random.PRNGKey(0))
state = aviary.set_setpoint(state, 0, jnp.asarray([2.0, 0.0, 0.0, 1.0]))  # into the box

step = jax.jit(aviary.step)
for i in range(600):
    state = step(state)
    if bool(state.contact[0]):
        print(f"contact with obstacle at aviary step {i}, "
              f"pos={aviary.state(state, 0)[3]}")
        break
else:
    print("no contact (unexpected)")
