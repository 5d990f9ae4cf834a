"""Records MuJoCo golden traces for the rigid-body parity suite.

Run with the MuJoCo-equipped interpreter (NOT the repo env):

    /opt/venv/bin/python tests/fixtures/gen_mujoco_traces.py

Writes one ``mujoco_<scenario>.npz`` per scenario in parity_scenarios.py into
this directory. The npz files are committed; tests/test_mujoco_parity.py
consumes them without needing MuJoCo.

Modeling choices that make the comparison exact (see parity_scenarios.py for
why MuJoCo is the oracle):
- one body, free joint, inertial frame at the body origin (CoM == origin), so
  xfrc_applied acts at the CoM with no ambiguity;
- integrator="Euler" (semi-implicit: velocities then positions), timestep
  1/240 — the scheme PyBullet's stepSimulation uses (btMultiBody forward
  dynamics + semi-implicit Euler);
- body-frame wrench schedules are rotated into the world frame with the
  body's CURRENT orientation before each mj_step, mirroring
  pyflyt_tpu/core/integrator.py::step which evaluates R(q_t) once per step;
- no geoms -> no contacts; fluid density/viscosity are MuJoCo defaults (0).

State is read from qpos/qvel directly after each mj_step (NOT from sensors:
sensordata after mj_step reflects the pre-integration state), with the
free-joint body-frame angular qvel rotated to the world frame and the
quaternion converted to the repo's xyzw order on save.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from parity_scenarios import (  # noqa: E402
    CONTACT_SCENARIOS,
    DT,
    SCENARIOS,
    wrench_schedule,
)

import mujoco  # noqa: E402


def build_model(sc):
    inertia = sc["inertia"]
    if isinstance(inertia[0], list):  # full tensor
        i = inertia
        inertial = (
            f'<inertial pos="0 0 0" mass="{sc["mass"]}" '
            f'fullinertia="{i[0][0]} {i[1][1]} {i[2][2]} '
            f'{i[0][1]} {i[0][2]} {i[1][2]}"/>'
        )
    else:
        inertial = (
            f'<inertial pos="0 0 0" mass="{sc["mass"]}" '
            f'diaginertia="{inertia[0]} {inertia[1]} {inertia[2]}"/>'
        )
    xml = f"""
<mujoco>
  <option integrator="Euler" timestep="{DT}" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="b" pos="0 0 0">
      <freejoint/>
      {inertial}
    </body>
  </worldbody>
  <sensor>
    <framepos objtype="body" objname="b"/>
    <framequat objtype="body" objname="b"/>
    <framelinvel objtype="body" objname="b"/>
    <frameangvel objtype="body" objname="b"/>
  </sensor>
</mujoco>"""
    return mujoco.MjModel.from_xml_string(xml)


def quat_wxyz_to_rotmat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def run(name, sc):
    m = build_model(sc)
    d = mujoco.MjData(m)
    body_id = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, "b")

    q0 = np.asarray(sc["quat_wxyz"], dtype=np.float64)
    q0 = q0 / np.linalg.norm(q0)
    R0 = quat_wxyz_to_rotmat(q0)
    d.qpos[0:3] = sc["pos"]
    d.qpos[3:7] = q0
    d.qvel[0:3] = sc["lin_vel"]
    # free-joint rotational qvel is the BODY-frame angular velocity
    # (verified empirically against the world-frame frameangvel sensor)
    d.qvel[3:6] = R0.T @ np.asarray(sc["ang_vel_world"], dtype=np.float64)

    steps = sc["steps"]
    f_body, t_body = wrench_schedule(sc["wrench"], steps)
    f_body = np.asarray(f_body, dtype=np.float64)
    t_body = np.asarray(t_body, dtype=np.float64)

    pos = np.zeros((steps, 3))
    quat_xyzw = np.zeros((steps, 4))
    lin_vel = np.zeros((steps, 3))
    ang_vel = np.zeros((steps, 3))

    mujoco.mj_forward(m, d)
    for k in range(steps):
        # rotate the body-frame wrench to world with the CURRENT orientation
        qk = d.qpos[3:7]
        Rk = quat_wxyz_to_rotmat(qk / np.linalg.norm(qk))
        d.xfrc_applied[body_id, 0:3] = Rk @ f_body[k]
        d.xfrc_applied[body_id, 3:6] = Rk @ t_body[k]
        mujoco.mj_step(m, d)
        q = d.qpos[3:7] / np.linalg.norm(d.qpos[3:7])
        Rn = quat_wxyz_to_rotmat(q)
        pos[k] = d.qpos[0:3]
        quat_xyzw[k] = [q[1], q[2], q[3], q[0]]
        lin_vel[k] = d.qvel[0:3]
        ang_vel[k] = Rn @ d.qvel[3:6]

    inertia = np.asarray(sc["inertia"], dtype=np.float64)
    out = os.path.join(os.path.dirname(__file__), f"mujoco_{name}.npz")
    np.savez_compressed(
        out,
        dt=DT,
        mass=sc["mass"],
        inertia=inertia,
        full_inertia=np.asarray(inertia.ndim == 2),
        init_pos=np.asarray(sc["pos"], dtype=np.float64),
        init_quat_xyzw=np.asarray([q0[1], q0[2], q0[3], q0[0]]),
        init_lin_vel=np.asarray(sc["lin_vel"], dtype=np.float64),
        init_ang_vel_world=np.asarray(sc["ang_vel_world"], dtype=np.float64),
        force_body=f_body,
        torque_body=t_body,
        pos=pos,
        quat_xyzw=quat_xyzw,
        lin_vel=lin_vel,
        ang_vel=ang_vel,
        mujoco_version=mujoco.__version__,
    )
    print(f"{name}: {steps} steps -> {out}")


def build_contact_model(sc):
    """Free body over a ground plane; each body-frame contact sample point
    becomes a sphere geom of radius ``contact_radius`` centered at it (see
    parity_scenarios.py's geometry-mapping note). Explicit <inertial>
    overrides geom-derived mass, so the spheres are pure collision shapes."""
    inertia = sc["inertia"]
    assert not isinstance(inertia[0], list)
    inertial = (
        f'<inertial pos="0 0 0" mass="{sc["mass"]}" '
        f'diaginertia="{inertia[0]} {inertia[1]} {inertia[2]}"/>'
    )
    mu, r = sc["friction"], sc["contact_radius"]
    geoms = "\n      ".join(
        f'<geom type="sphere" size="{r}" pos="{p[0]} {p[1]} {p[2]}" '
        f'friction="{mu} 0 0" condim="3"/>'
        for p in sc["points"]
    )
    xml = f"""
<mujoco>
  <option integrator="Euler" timestep="{DT}" gravity="0 0 -9.81"/>
  <worldbody>
    <geom type="plane" size="50 50 1" friction="{mu} 0 0" condim="3"/>
    <body name="b" pos="0 0 0">
      <freejoint/>
      {inertial}
      {geoms}
    </body>
  </worldbody>
</mujoco>"""
    return mujoco.MjModel.from_xml_string(xml)


def run_contact(name, sc):
    m = build_contact_model(sc)
    d = mujoco.MjData(m)
    body_id = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, "b")

    q0 = np.asarray(sc["quat_wxyz"], dtype=np.float64)
    q0 = q0 / np.linalg.norm(q0)
    R0 = quat_wxyz_to_rotmat(q0)
    d.qpos[0:3] = sc["pos"]
    d.qpos[3:7] = q0
    d.qvel[0:3] = sc["lin_vel"]
    d.qvel[3:6] = R0.T @ np.asarray(sc["ang_vel_world"], dtype=np.float64)

    steps = sc["steps"]
    f_body, t_body = wrench_schedule(sc["wrench"], steps)
    f_body = np.asarray(f_body, dtype=np.float64)
    t_body = np.asarray(t_body, dtype=np.float64)

    pos = np.zeros((steps, 3))
    quat_xyzw = np.zeros((steps, 4))
    lin_vel = np.zeros((steps, 3))
    ang_vel = np.zeros((steps, 3))
    in_contact = np.zeros(steps, dtype=bool)

    mujoco.mj_forward(m, d)
    for k in range(steps):
        qk = d.qpos[3:7]
        Rk = quat_wxyz_to_rotmat(qk / np.linalg.norm(qk))
        d.xfrc_applied[body_id, 0:3] = Rk @ f_body[k]
        d.xfrc_applied[body_id, 3:6] = Rk @ t_body[k]
        mujoco.mj_step(m, d)
        q = d.qpos[3:7] / np.linalg.norm(d.qpos[3:7])
        Rn = quat_wxyz_to_rotmat(q)
        pos[k] = d.qpos[0:3]
        quat_xyzw[k] = [q[1], q[2], q[3], q[0]]
        lin_vel[k] = d.qvel[0:3]
        ang_vel[k] = Rn @ d.qvel[3:6]
        in_contact[k] = d.ncon > 0

    out = os.path.join(os.path.dirname(__file__), f"mujoco_{name}.npz")
    np.savez_compressed(
        out,
        dt=DT,
        mass=sc["mass"],
        inertia=np.asarray(sc["inertia"], dtype=np.float64),
        full_inertia=np.asarray(False),
        init_pos=np.asarray(sc["pos"], dtype=np.float64),
        init_quat_xyzw=np.asarray([q0[1], q0[2], q0[3], q0[0]]),
        init_lin_vel=np.asarray(sc["lin_vel"], dtype=np.float64),
        init_ang_vel_world=np.asarray(sc["ang_vel_world"], dtype=np.float64),
        force_body=f_body,
        torque_body=t_body,
        contact_points=np.asarray(sc["points"], dtype=np.float64),
        friction=sc["friction"],
        contact_radius=sc["contact_radius"],
        pos=pos,
        quat_xyzw=quat_xyzw,
        lin_vel=lin_vel,
        ang_vel=ang_vel,
        in_contact=in_contact,
        mujoco_version=mujoco.__version__,
    )
    print(f"{name}: {steps} steps, first contact at "
          f"{int(np.argmax(in_contact)) if in_contact.any() else -1} -> {out}")


if __name__ == "__main__":
    for name, sc in SCENARIOS.items():
        run(name, sc)
    for name, sc in CONTACT_SCENARIOS.items():
        run_contact(name, sc)
