"""Functional Aviary tests — ports of the reference core API suite
(/root/reference/tests/test_core.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pyflyt_tpu.core.aviary import Aviary, DroneSpec


def test_simple_spawn_and_steps():
    """Single drone, position mode, many steps without crashing
    (test_core.py:12-30)."""
    av = Aviary(
        start_pos=[[0.0, 0.0, 1.0]], start_orn=[[0.0, 0.0, 0.0]],
        specs=(DroneSpec(drone_type="quadx", mode=7),),
    )
    state = av.reset(jax.random.PRNGKey(0))
    state = av.set_setpoint(state, 0, jnp.asarray([0.0, 0.0, 0.0, 1.0]))

    @jax.jit
    def run(state):
        def body(s, _):
            return av.step(s), None
        return jax.lax.scan(body, state, None, length=200)[0]

    state = run(state)
    view = np.asarray(av.state(state, 0))
    assert np.isfinite(view).all()
    # held position near the setpoint [0, 0, z=1]
    assert abs(view[3, 2] - 1.0) < 0.5
    assert int(state.aviary_steps) == 200


def test_multi_drone_heterogeneous_rates():
    """3 quadx at control 60/120/240 Hz in one sim (test_core.py:33-61)."""
    av = Aviary(
        start_pos=[[0.0, 0.0, 1.0], [2.0, 0.0, 1.0], [4.0, 0.0, 1.0]],
        start_orn=[[0.0, 0.0, 0.0]] * 3,
        specs=(
            DroneSpec(drone_type="quadx", control_hz=60, mode=7),
            DroneSpec(drone_type="quadx", control_hz=120, mode=7),
            DroneSpec(drone_type="quadx", control_hz=240, mode=7),
        ),
    )
    assert av.updates_per_step == 4  # 240 / min(60)
    state = av.reset(jax.random.PRNGKey(0))
    for i, x in enumerate((0.0, 2.0, 4.0)):
        state = av.set_setpoint(state, i, jnp.asarray([x, 0.0, 0.0, 1.0]))

    @jax.jit
    def run(state):
        def body(s, _):
            return av.step(s), None
        return jax.lax.scan(body, state, None, length=120)[0]

    state = run(state)
    for i, x in enumerate((0.0, 2.0, 4.0)):
        view = np.asarray(av.state(state, i))
        assert np.isfinite(view).all()
        assert abs(view[3, 0] - x) < 0.5
        assert abs(view[3, 2] - 1.0) < 0.5


def test_setpoint_sequence():
    """Fly a sequence of position setpoints (test_core.py:64-92)."""
    av = Aviary(
        start_pos=[[0.0, 0.0, 1.0]], start_orn=[[0.0, 0.0, 0.0]],
        specs=(DroneSpec(drone_type="quadx", mode=7),),
    )
    state = av.reset(jax.random.PRNGKey(1))

    @jax.jit
    def fly(state, sp):
        state = av.set_setpoint(state, 0, sp)
        def body(s, _):
            return av.step(s), None
        return jax.lax.scan(body, state, None, length=150)[0]

    for target in ([1.0, 0.0, 0.0, 1.0], [1.0, 1.0, 0.0, 2.0], [0.0, 0.0, 0.0, 1.0]):
        state = fly(state, jnp.asarray(target))
        view = np.asarray(av.state(state, 0))
        np.testing.assert_allclose(
            view[3], [target[0], target[1], target[3]], atol=0.6
        )


def test_custom_controller():
    """Custom ControlClass registered over a base mode (test_core.py:140-190):
    a controller that offsets the position setpoint by +1 in x."""
    def offset_controller(view, setpoint):
        return setpoint + jnp.asarray([1.0, 0.0, 0.0, 0.0])

    av = Aviary(
        start_pos=[[0.0, 0.0, 1.0]], start_orn=[[0.0, 0.0, 0.0]],
        specs=(
            DroneSpec(
                drone_type="quadx", mode=7, custom_controller=offset_controller
            ),
        ),
    )
    state = av.reset(jax.random.PRNGKey(2))
    state = av.set_setpoint(state, 0, jnp.asarray([0.0, 0.0, 0.0, 1.0]))

    @jax.jit
    def run(state):
        def body(s, _):
            return av.step(s), None
        return jax.lax.scan(body, state, None, length=200)[0]

    state = run(state)
    view = np.asarray(av.state(state, 0))
    assert abs(view[3, 0] - 1.0) < 0.4  # flew to the offset target


def test_mixed_fleet():
    """rocket + quadx + fixedwing in one aviary (test_core.py:226-257)."""
    av = Aviary(
        start_pos=[[0.0, 0.0, 100.0], [5.0, 0.0, 1.0], [10.0, 0.0, 50.0]],
        start_orn=[[0.0, 0.0, 0.0]] * 3,
        specs=(
            DroneSpec(drone_type="rocket", mode=0),
            DroneSpec(drone_type="quadx", mode=7),
            DroneSpec(drone_type="fixedwing", mode=0),
        ),
    )
    state = av.reset(jax.random.PRNGKey(3))
    state = av.set_all_setpoints(
        state,
        [
            jnp.zeros(7),
            jnp.asarray([5.0, 0.0, 0.0, 1.0]),
            jnp.asarray([0.0, 0.0, 0.0, 0.7]),
        ],
    )

    @jax.jit
    def run(state):
        def body(s, _):
            return av.step(s), None
        return jax.lax.scan(body, state, None, length=60)[0]

    state = run(state)
    for i in range(3):
        assert np.isfinite(np.asarray(av.state(state, i))).all()
    # rocket free-falls, fixedwing cruises forward
    assert float(av.state(state, 0)[3, 2]) < 100.0
    assert float(av.state(state, 2)[3, 0]) > 11.0
    # aux sizes per type (aviary API parity)
    assert av.aux_state(state, 0).shape == (9,)
    assert av.aux_state(state, 1).shape == (4,)
    assert av.aux_state(state, 2).shape == (6,)


def test_set_armed_ballistic():
    """Disarmed drones get no forces and fall ballistically
    (aviary.py:422-436)."""
    av = Aviary(
        start_pos=[[0.0, 0.0, 10.0]], start_orn=[[0.0, 0.0, 0.0]],
        specs=(DroneSpec(drone_type="quadx", mode=7),),
    )
    state = av.reset(jax.random.PRNGKey(4))
    state = av.set_setpoint(state, 0, jnp.asarray([0.0, 0.0, 0.0, 10.0]))
    state = av.set_armed(state, [False])

    @jax.jit
    def run(state):
        def body(s, _):
            return av.step(s), None
        return jax.lax.scan(body, state, None, length=60)[0]

    pre_view = np.asarray(av.state(state, 0))
    state = run(state)  # 0.5 s
    # the BODY free-falls: z ≈ 10 − ½·9.81·0.25 ≈ 8.77, nothing fighting it
    body = state.drones[0].body
    np.testing.assert_allclose(
        float(body.pos[2]), 10.0 - 0.5 * 9.81 * 0.25, atol=0.05
    )
    np.testing.assert_allclose(float(body.lin_vel[2]), -9.81 * 0.5, atol=0.1)
    # ...but the sensor view stays FROZEN at the disarm-time reading (the
    # reference skips update_state for disarmed drones, aviary.py:487-488)
    np.testing.assert_array_equal(np.asarray(av.state(state, 0)), pre_view)


def test_wind_field_hook():
    """Wind plugged at the aviary level affects all drones
    (test_core.py:260-336)."""
    from pyflyt_tpu.core.wind import ConstantWind

    av = Aviary(
        start_pos=[[0.0, 0.0, 5.0]], start_orn=[[0.0, 0.0, 0.0]],
        specs=(DroneSpec(drone_type="quadx", mode=0),),
        wind_fn=ConstantWind(jnp.asarray([10.0, 0.0, 0.0])),
    )
    state = av.reset(jax.random.PRNGKey(5))
    state = av.set_setpoint(state, 0, jnp.asarray([0.0, 0.0, 0.0, 0.37]))

    @jax.jit
    def run(state):
        def body(s, _):
            return av.step(s), None
        return jax.lax.scan(body, state, None, length=120)[0]

    state = run(state)
    assert float(av.state(state, 0)[3, 0]) > 0.01  # blown downwind


def test_drone_drone_collision_matrix():
    av = Aviary(
        start_pos=[[0.0, 0.0, 1.0], [0.05, 0.0, 1.0]],
        start_orn=[[0.0, 0.0, 0.0]] * 2,
        specs=(DroneSpec(drone_type="quadx"), DroneSpec(drone_type="quadx")),
    )
    state = av.reset(jax.random.PRNGKey(6))
    state = jax.jit(av.step)(state)
    m = np.asarray(state.contact_matrix)
    assert m[0, 1] and m[1, 0]
    assert np.asarray(state.contact).all()


def test_obstacle_contact():
    """Static obstacle boxes feed the contact flags (load_objs parity)."""
    from pyflyt_tpu.core import camera as cam

    wall = cam.Boxes(
        centers=jnp.asarray([[1.0, 0.0, 1.0]]),
        half_extents=jnp.asarray([[0.2, 2.0, 2.0]]),
        rotations=jnp.eye(3)[None],
        colors=jnp.asarray([[0.5, 0.5, 0.5, 1.0]]),
        visible=jnp.ones((1,), bool),
    )
    av = Aviary(
        start_pos=[[0.0, 0.0, 1.0]], start_orn=[[0.0, 0.0, 0.0]],
        specs=(DroneSpec(drone_type="quadx", mode=7),),
        obstacles=wall,
    )
    state = av.reset(jax.random.PRNGKey(0))
    # fly into the wall
    state = av.set_setpoint(state, 0, jnp.asarray([2.0, 0.0, 0.0, 1.0]))

    @jax.jit
    def run(state):
        def body(s, _):
            s = av.step(s)
            return s, s.contact[0]
        return jax.lax.scan(body, state, None, length=200)
    state, contacts = run(state)
    assert bool(np.asarray(contacts).any())


def test_obstacle_response_blocks_drone():
    """``obstacle_response=True``: the sphere-proxy impulse keeps a drone
    from passing through a wall (PyBullet loadOBJ collision-response
    analogue; detection-only remains the default)."""
    from pyflyt_tpu.core import camera as cam

    wall = cam.Boxes(
        centers=jnp.asarray([[1.0, 0.0, 1.0]]),
        half_extents=jnp.asarray([[0.2, 2.0, 2.0]]),
        rotations=jnp.eye(3)[None],
        colors=jnp.asarray([[0.5, 0.5, 0.5, 1.0]]),
        visible=jnp.ones((1,), bool),
    )

    def fly_at_wall(**kw):
        av = Aviary(
            start_pos=[[0.0, 0.0, 1.0]], start_orn=[[0.0, 0.0, 0.0]],
            specs=(DroneSpec(drone_type="quadx", mode=7,
                             options={"noisy_motors": False}),),
            obstacles=wall,
            **kw,
        )
        state = av.reset(jax.random.PRNGKey(0))
        state = av.set_setpoint(state, 0, jnp.asarray([2.0, 0.0, 0.0, 1.0]))

        @jax.jit
        def run(state):
            def body(s, _):
                s = av.step(s)
                return s, (av.state(s, 0)[3, 0], s.contact[0])
            return jax.lax.scan(body, state, None, length=300)
        _, (xs, contacts) = run(state)
        return np.asarray(xs), np.asarray(contacts)

    xs_resp, contacts_resp = fly_at_wall(obstacle_response=True)
    xs_thru, _ = fly_at_wall()
    # detection-only: the drone tunnels through the 0.8-2.2m slab
    assert xs_thru.max() > 1.5
    # response: blocked at the wall face (0.8m minus the collision radius)
    assert bool(contacts_resp.any())
    assert xs_resp.max() < 0.85
    # and it never teleports past the wall later
    assert xs_resp[-1] < 0.85


def test_obstacle_impulse_cancels_normal_velocity():
    """Unit-level: a body inside a box face gets projected out with its
    approaching normal velocity removed, restitution 0."""
    from pyflyt_tpu.core import camera as cam
    from pyflyt_tpu.core.integrator import Body6DoF

    box = cam.Boxes(
        centers=jnp.asarray([[0.0, 0.0, 0.0]]),
        half_extents=jnp.asarray([[1.0, 1.0, 1.0]]),
        rotations=jnp.eye(3)[None],
        colors=jnp.asarray([[0.5, 0.5, 0.5, 1.0]]),
        visible=jnp.ones((1,), bool),
    )
    av = Aviary(
        start_pos=[[0.0, 0.0, 1.0]], start_orn=[[0.0, 0.0, 0.0]],
        specs=(DroneSpec(drone_type="quadx"),),
        obstacles=box,
        obstacle_response=True,
    )
    body = Body6DoF(
        pos=jnp.asarray([1.05, 0.0, 0.0]),  # sphere r=0.065 overlaps +x face
        quat=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
        lin_vel=jnp.asarray([-1.0, 0.3, 0.0]),
        ang_vel=jnp.zeros(3),
    )
    out = jax.jit(lambda b: av._obstacle_impulse(b, 0.065))(body)
    np.testing.assert_allclose(float(out.pos[0]), 1.065, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.lin_vel), [0.0, 0.3, 0.0], atol=1e-6
    )
    # separating bodies are untouched
    body2 = body.replace(pos=jnp.asarray([1.2, 0.0, 0.0]))
    out2 = jax.jit(lambda b: av._obstacle_impulse(b, 0.065))(body2)
    np.testing.assert_allclose(np.asarray(out2.pos), np.asarray(body2.pos))
    np.testing.assert_allclose(
        np.asarray(out2.lin_vel), np.asarray(body2.lin_vel)
    )
