"""OBJ scene loading tests (reference surface: core/utils/load_objs.py:8-80
and examples/core/06_spawning_objects.py).

The loader's contract: a watertight mesh becomes a conservative, static box
cover that plugs into the Aviary's existing obstacle contact/impulse path.
"""

import os
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyflyt_tpu.core import Aviary, DroneSpec
from pyflyt_tpu.core.load_objs import (
    boxes_from_mesh,
    load_obj_mesh,
    loadOBJ,
    merge_boxes,
)

CUBE_OBJ = textwrap.dedent(
    """
    v 0 0 0
    v 1 0 0
    v 1 1 0
    v 0 1 0
    v 0 0 1
    v 1 0 1
    v 1 1 1
    v 0 1 1
    f 1 4 3 2
    f 5 6 7 8
    f 1 2 6 5
    f 2 3 7 6
    f 3 4 8 7
    f 4 1 5 8
    """
)


@pytest.fixture
def cube_path(tmp_path):
    p = tmp_path / "cube.obj"
    p.write_text(CUBE_OBJ)
    return str(p)


@pytest.fixture
def lshape_path(tmp_path):
    """A genuine L: a 2x1x1 slab plus a 1x1x1 cube on top of its first half."""
    verts, faces = [], []

    def add_box(lo, hi):
        base = len(verts)
        for sx in (0, 1):
            for sy in (0, 1):
                for sz in (0, 1):
                    verts.append(
                        (
                            lo[0] + sx * (hi[0] - lo[0]),
                            lo[1] + sy * (hi[1] - lo[1]),
                            lo[2] + sz * (hi[2] - lo[2]),
                        )
                    )
        for tri in [
            (0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),
            (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),
            (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),
        ]:
            faces.append(tuple(base + t for t in tri))

    add_box((0, 0, 0), (2, 1, 1))
    add_box((0, 0, 1), (1, 1, 2))
    lines = [f"v {x} {y} {z}" for x, y, z in verts]
    lines += [f"f {a + 1} {b + 1} {c + 1}" for a, b, c in faces]
    p = tmp_path / "l.obj"
    p.write_text("\n".join(lines))
    return str(p)


def test_parse_quads_and_negative_indices(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n")
    v, f = load_obj_mesh(str(p))
    assert v.shape == (4, 3)
    assert f.shape == (2, 3)  # quad fan-triangulated
    np.testing.assert_array_equal(f[0], [0, 1, 2])


def test_cube_collapses_to_one_box(cube_path):
    v, f = load_obj_mesh(cube_path)
    centers, half = boxes_from_mesh(v, f, resolution=16)
    assert centers.shape == (1, 3)
    # conservative: covers the unit cube within one voxel of slack
    np.testing.assert_allclose(centers[0], [0.5, 0.5, 0.5], atol=0.05)
    assert (half[0] >= 0.5 - 1e-9).all() and (half[0] <= 0.5 + 1.0 / 16).all()


def test_cover_is_conservative_and_solid(lshape_path):
    """Every mesh vertex (and the interior) lies inside the box union; the
    notch of the L stays empty."""
    v, f = load_obj_mesh(lshape_path)
    centers, half = boxes_from_mesh(v, f, resolution=20)

    def inside(p):
        return bool(
            np.any(np.all(np.abs(p[None, :] - centers) <= half + 1e-9, axis=-1))
        )

    for p in v:
        assert inside(p), p
    assert inside(np.array([0.5, 0.5, 1.5]))  # interior of the upper cube
    assert inside(np.array([1.5, 0.5, 0.5]))  # interior of the slab
    # the notch above the slab's far half is OUTSIDE the mesh volume
    assert not inside(np.array([1.7, 0.5, 1.7]))


def test_loadobj_transform_and_merge(cube_path):
    a = loadOBJ(cube_path, base_position=(5.0, 0.0, 0.0),
                base_orientation=(0.0, 0.0, np.pi / 2), resolution=8)
    b = loadOBJ(cube_path, base_position=(0.0, 5.0, 0.0), resolution=8)
    # yaw-90 about the base maps local (1, 0.5, 0.5)-ish center to (-0.5, 1)
    np.testing.assert_allclose(
        np.asarray(a.centers)[0], [4.5, 0.5, 0.5], atol=0.1
    )
    s = merge_boxes(a, b)
    assert s.centers.shape[0] == a.centers.shape[0] + b.centers.shape[0]
    assert s.rotations.shape[-2:] == (3, 3)


def test_loadobj_rejects_dynamic_bodies(cube_path):
    with pytest.raises(ValueError, match="static"):
        loadOBJ(cube_path, base_mass=1.0)


def test_mesh_obstacle_contact_and_response(lshape_path):
    """A quad flown into a loaded mesh reports contact; with
    obstacle_response=True the impulse keeps it outside the geometry (the
    loadOBJ collision semantics of the reference example)."""
    scene = loadOBJ(lshape_path, base_position=(1.0, -0.5, 0.0), resolution=12)
    aviary = Aviary(
        start_pos=[[0.0, 0.0, 0.5]],
        start_orn=[[0.0, 0.0, 0.0]],
        specs=(DroneSpec(drone_type="quadx", mode=7),),
        obstacles=scene,
        obstacle_response=True,
    )
    state = aviary.reset(jax.random.PRNGKey(0))
    # command straight into the slab (its near face is at x=1)
    state = aviary.set_setpoint(state, 0, jnp.asarray([2.0, 0.0, 0.0, 0.5]))
    step = jax.jit(aviary.step)
    hit = False
    for _ in range(240):
        state = step(state)
        hit = hit or bool(state.contact[0])
    assert hit, "drone never touched the mesh"
    x = float(aviary.state(state, 0)[3][0])
    assert x < 1.05, f"drone penetrated the mesh slab (x={x})"