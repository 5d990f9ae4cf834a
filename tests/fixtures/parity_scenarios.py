"""Golden-trace parity scenarios shared by the MuJoCo generator and the test.

Why MuJoCo and not PyBullet: the fidelity target (BASELINE.md:28) asks for
trajectory parity with the reference's physics backend, but PyBullet is not
installable in this environment (zero network egress; no wheel on disk).
MuJoCo 3.10 (at /opt/venv) is an *independent* C physics engine implementing
the same integration scheme PyBullet uses for a floating rigid body —
semi-implicit Euler at fixed dt, full Euler rigid-body equations with the
gyroscopic term (see /root/reference/PyFlyt/core/aviary.py:491 stepSimulation
and SURVEY.md §7 "Hard parts") — so it serves as the golden-trace oracle for
exactly the failure mode VERDICT.md round 1 flagged: a systematic
integrator/frame-convention error that self-referential formula tests cannot
catch.

This module is dependency-free plain Python so that BOTH sides import it:
- tests/fixtures/gen_mujoco_traces.py (runs under /opt/venv/bin/python)
- tests/test_mujoco_parity.py (runs under the repo's JAX environment)

Each scenario integrates a single floating rigid body for `steps` physics
steps of DT seconds under an optional deterministic body-frame wrench
schedule. Values mirror the real vehicles:
- quadx: cf2x.urdf mass/inertia (/root/reference/PyFlyt/models/vehicles/cf2x/
  cf2x.urdf:13-15)
- fixedwing: the composite rigid-body mass/full-inertia assembled from the
  URDF point masses by pyflyt_tpu/models/fixedwing.py::build_params
  (off-diagonal ixz term exercises the full-inertia Euler-equation path).
"""

import math

DT = 1.0 / 240.0  # reference physics rate (aviary.py:53)

QUADX_MASS = 0.027
QUADX_INERTIA_DIAG = [1.4e-5, 1.4e-5, 2.17e-5]

FIXEDWING_MASS = 2.3499999046325684
# body-frame composite inertia about the CoM (symmetric, ixz != 0)
FIXEDWING_INERTIA_FULL = [
    [0.36210108, 0.0, 0.0048510637],
    [0.0, 0.12745214, 0.0],
    [0.0048510637, 0.0, 0.48735106],
]


def euler_to_quat_wxyz(roll, pitch, yaw):
    """World-XYZ fixed-axes euler -> quaternion (w, x, y, z).

    Matches PyBullet's getQuaternionFromEuler convention
    (R = Rz(yaw) @ Ry(pitch) @ Rx(roll)).
    """
    cr, sr = math.cos(roll / 2), math.sin(roll / 2)
    cp, sp = math.cos(pitch / 2), math.sin(pitch / 2)
    cy, sy = math.cos(yaw / 2), math.sin(yaw / 2)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return [w, x, y, z]


def wrench_schedule(name, steps):
    """Deterministic body-frame (force, torque) schedule, shape (steps, 3) each.

    Computed (not stored) identically on both sides only here; the generator
    stores the evaluated arrays in the npz so the test consumes recorded data.
    """
    forces, torques = [], []
    for k in range(steps):
        t = k * DT
        if name is None:
            forces.append([0.0, 0.0, 0.0])
            torques.append([0.0, 0.0, 0.0])
        elif name == "quadx_mix":
            # thrust-like body-z force around hover (m g = 0.2649 N) plus
            # lateral disturbance forces and small control-scale torques
            forces.append(
                [
                    0.05 * math.sin(2 * math.pi * 0.7 * t),
                    0.04 * math.sin(2 * math.pi * 1.1 * t + 1.0),
                    0.2649 + 0.10 * math.sin(2 * math.pi * 0.5 * t),
                ]
            )
            torques.append(
                [
                    1e-4 * math.sin(2 * math.pi * 1.3 * t),
                    1e-4 * math.cos(2 * math.pi * 0.9 * t),
                    5e-5 * math.sin(2 * math.pi * 0.4 * t + 0.5),
                ]
            )
        elif name == "const_thrust":
            forces.append([0.0, 0.0, 0.35])
            torques.append([0.0, 0.0, 0.0])
        elif name == "touchdown_thrust":
            # sub-hover body-z thrust (mg = 0.2649 N): a powered descent that
            # stays powered through touchdown, like a landing quad
            forces.append([0.0, 0.0, 0.15])
            torques.append([0.0, 0.0, 0.0])
        elif name == "plane_aero_like":
            # forces/torques at fixedwing scale: forward pull + lift + moments
            forces.append(
                [
                    4.0 + 1.0 * math.sin(2 * math.pi * 0.3 * t),
                    0.5 * math.sin(2 * math.pi * 0.8 * t),
                    23.0 + 3.0 * math.sin(2 * math.pi * 0.6 * t + 0.3),
                ]
            )
            torques.append(
                [
                    0.2 * math.sin(2 * math.pi * 0.5 * t),
                    0.3 * math.cos(2 * math.pi * 0.4 * t),
                    0.1 * math.sin(2 * math.pi * 0.7 * t + 1.0),
                ]
            )
        else:
            raise ValueError(name)
    return forces, torques


# Initial angular velocities are given in the WORLD frame (the repo's
# Body6DoF.ang_vel convention; the generator converts to MuJoCo's body-frame
# free-joint qvel).
SCENARIOS = {
    # pure ballistic tumble, diagonal inertia: validates gravity, the
    # gyroscopic term and quaternion integration with zero applied wrench
    "tumble_quadx": dict(
        mass=QUADX_MASS,
        inertia=QUADX_INERTIA_DIAG,
        pos=[0.0, 0.0, 50.0],
        quat_wxyz=euler_to_quat_wxyz(0.3, -0.2, 0.5),
        lin_vel=[1.0, -2.0, 3.0],
        ang_vel_world=[6.0, -3.0, 2.0],
        steps=1200,
        wrench=None,
    ),
    # full (off-diagonal) inertia tumble at fixedwing scale: validates the
    # _solve3x3 adjugate path of the Euler equations
    "tumble_fixedwing_full_inertia": dict(
        mass=FIXEDWING_MASS,
        inertia=FIXEDWING_INERTIA_FULL,
        pos=[0.0, 0.0, 120.0],
        quat_wxyz=euler_to_quat_wxyz(-0.4, 0.25, 1.2),
        lin_vel=[15.0, 0.0, 1.0],
        ang_vel_world=[4.0, 2.0, -1.0],
        steps=1200,
        wrench=None,
    ),
    # fast axisymmetric top: precession rate is exquisitely sensitive to the
    # gyroscopic term's sign/frame. Horizon kept at 4 s / spin at 30 rad/s:
    # the explicit-Euler discretization of the free gyroscopic term (shared
    # by MuJoCo's Euler integrator and this repo's core) is exponentially
    # unstable for fast long free spins — MuJoCo itself blows up past ~8 s
    # at 50 rad/s — so parity is asserted inside the stable regime.
    "precession_top": dict(
        mass=0.5,
        inertia=[0.002, 0.002, 0.004],
        pos=[0.0, 0.0, 30.0],
        quat_wxyz=euler_to_quat_wxyz(0.3, 0.0, 0.0),
        lin_vel=[0.0, 0.0, 0.0],
        # spin about the tilted body z axis at 30 rad/s: world ω = R @ [0,0,30]
        ang_vel_world=[0.0, -30.0 * math.sin(0.3), 30.0 * math.cos(0.3)],
        steps=960,
        wrench=None,
    ),
    # body-frame wrench schedule at quadx scale: validates that applied forces
    # rotate with the body exactly as PyBullet LINK_FRAME application does
    # (/root/reference/PyFlyt/core/abstractions/motors.py:148-151)
    "wrench_quadx_mix": dict(
        mass=QUADX_MASS,
        inertia=QUADX_INERTIA_DIAG,
        pos=[0.0, 0.0, 20.0],
        quat_wxyz=euler_to_quat_wxyz(0.05, -0.03, 0.8),
        lin_vel=[0.0, 0.0, 0.0],
        ang_vel_world=[0.0, 0.0, 0.0],
        steps=1200,
        wrench="quadx_mix",
    ),
    # constant body-z thrust on a tilted quad: the classic frame-convention
    # trap (curved trajectory depends on thrust staying body-fixed)
    "tilted_thrust_quadx": dict(
        mass=QUADX_MASS,
        inertia=QUADX_INERTIA_DIAG,
        pos=[0.0, 0.0, 20.0],
        quat_wxyz=euler_to_quat_wxyz(0.4, 0.2, 0.0),
        lin_vel=[0.0, 0.0, 0.0],
        ang_vel_world=[0.0, 0.0, 0.0],
        steps=960,
        wrench="const_thrust",
    ),
    # aero-scale wrench on the full-inertia plane body
    "wrench_fixedwing_aero": dict(
        mass=FIXEDWING_MASS,
        inertia=FIXEDWING_INERTIA_FULL,
        pos=[0.0, 0.0, 80.0],
        quat_wxyz=euler_to_quat_wxyz(0.0, 0.1, 0.0),
        lin_vel=[20.0, 0.0, 0.0],
        ang_vel_world=[0.0, 0.0, 0.0],
        steps=1200,
        wrench="plane_aero_like",
    ),
}


# ---------------------------------------------------------------------------
# contact-phase scenarios (VERDICT r2 missing-item 1)
# ---------------------------------------------------------------------------
# The repo's plane-contact model (core/integrator.py::ground_contact) is an
# impulse-lite approximation of what the reference gets from PyBullet's
# constraint solver (aviary.py:493-496), and the Rocket-Landing task *pays
# reward on* post-contact dynamics (rocket_landing_env.py:229-258). These
# scenarios record the SAME drop/touchdown/slide events from MuJoCo's contact
# solver so tests/test_mujoco_parity.py can bound the divergence instead of
# leaving the contact phase entirely uncross-checked.
#
# Geometry mapping that makes the two models comparable: each body-frame
# contact sample point becomes a MuJoCo sphere geom of radius
# ``contact_radius`` CENTERED at that point. A sphere-vs-plane contact
# activates exactly when the center's world z drops below the radius —
# identical to the repo's point-vs-plane test with ``ground_z=radius``,
# independent of body tilt. The residual modeling differences are real and
# intended to be measured: MuJoCo applies force at the sphere's bottom
# (lever arm longer by ~radius), resolves all active contacts simultaneously
# through a soft (solref 0.02 s) constraint, while the repo applies one
# impulse at the depth-weighted centroid with hard projection.

# rocket-scale composite: base 91 + booster 47 + 4 fins (rocket.yaml frame);
# inertia is representative (test exercises contact, not the fuel model)
ROCKET_DRY_MASS = 138.2
ROCKET_INERTIA_DIAG = [565.0, 565.0, 2.36]

QUADX_FEET = [
    [0.04, 0.04, -0.02],
    [-0.04, 0.04, -0.02],
    [0.04, -0.04, -0.02],
    [-0.04, -0.04, -0.02],
]
# the rocket's 3 landing-leg tips (rocket.yaml contact_points[:3])
ROCKET_LEGS = [
    [0.0, 0.6, -2.425],
    [0.5196, -0.3, -2.425],
    [-0.5196, -0.3, -2.425],
]

CONTACT_SCENARIOS = {
    # free drop onto the plane, settle flat on four feet: validates the
    # normal impulse + positional projection against a real contact solver
    "contact_drop_settle_quadx": dict(
        mass=QUADX_MASS,
        inertia=QUADX_INERTIA_DIAG,
        pos=[0.0, 0.0, 0.30],
        quat_wxyz=euler_to_quat_wxyz(0.0, 0.0, 0.0),
        lin_vel=[0.0, 0.0, 0.0],
        ang_vel_world=[0.0, 0.0, 0.0],
        steps=480,
        wrench=None,
        points=QUADX_FEET,
        friction=0.5,
        contact_radius=0.002,
    ),
    # land with lateral speed, Coulomb-slide to rest: validates the friction
    # impulse magnitude (slide distance ~ v^2 / 2 mu g)
    "contact_slide_friction_quadx": dict(
        mass=QUADX_MASS,
        inertia=QUADX_INERTIA_DIAG,
        pos=[0.0, 0.0, 0.06],
        quat_wxyz=euler_to_quat_wxyz(0.0, 0.0, 0.0),
        lin_vel=[1.5, 0.0, 0.0],
        ang_vel_world=[0.0, 0.0, 0.0],
        steps=480,
        wrench=None,
        points=QUADX_FEET,
        friction=0.5,
        contact_radius=0.002,
    ),
    # tilted powered descent through touchdown (the round-2 VERDICT's
    # "tilted-thrust touchdown"): thrust stays body-fixed while the feet
    # touch one corner first
    "contact_tilted_touchdown_quadx": dict(
        mass=QUADX_MASS,
        inertia=QUADX_INERTIA_DIAG,
        pos=[0.0, 0.0, 0.20],
        quat_wxyz=euler_to_quat_wxyz(0.15, -0.10, 0.0),
        lin_vel=[0.2, 0.0, -0.4],
        ang_vel_world=[0.0, 0.0, 0.0],
        steps=480,
        wrench="touchdown_thrust",
        points=QUADX_FEET,
        friction=0.5,
        contact_radius=0.002,
    ),
    # rocket-scale leg touchdown at landing speed (the Rocket-Landing task's
    # reward-bearing event, rocket_landing_env.py:229-258)
    "contact_rocket_legs": dict(
        mass=ROCKET_DRY_MASS,
        inertia=ROCKET_INERTIA_DIAG,
        pos=[0.0, 0.0, 3.0],
        quat_wxyz=euler_to_quat_wxyz(0.02, -0.015, 0.0),
        lin_vel=[0.1, 0.0, -2.0],
        ang_vel_world=[0.0, 0.0, 0.0],
        steps=480,
        wrench=None,
        points=ROCKET_LEGS,
        friction=0.5,
        contact_radius=0.03,
    ),
}
