"""Pallas TPU kernel: fused Rocket-Landing agent step.

The quadx/fixedwing treatment applied to the rocket: the whole drone state
packs into a folded ``(88, 8, N/8)`` f32 array and one kernel call runs the
ENTIRE landing-env agent step — ``env_step_ratio`` aviary steps, each with
``physics_control_ratio`` 240 Hz physics iterations, plus the task update,
termination bookkeeping and the done-freeze — register-resident per
128-env vector.

What makes the rocket different from the fixed-wing (and why its XLA path is
slow): the composite mass/CoM/inertia track the burning fuel EVERY physics
step (models/rocket.py:130-166, after the reference's ``changeDynamics`` on
the fuel-tank link, boosters.py:246-258), so nothing about the inertia is a
trace-time constant. In-kernel the composite is affine register math:

- ``mass = m_dry + fm``, ``com = (P_dry + fm*p_tank) / mass`` (3 registers),
- the 6 unique entries of the composite inertia accumulate the parallel-axis
  shifts of 7 point masses against the register-valued CoM,
- the body Euler equations invert that symmetric 3x3 per lane via the
  adjugate (core/integrator.py::_solve3x3's closed form).

Everything else follows the reference chain (models/rocket.py physics_iter,
itself cited against /root/reference/PyFlyt/core/drones/rocket.py:257-275):
body drag at the fuel-tank link -> 4 grid-fin Khan surfaces (shared core
ops/pallas_fixedwing.py::surface_normal_forward, lever arms as registers) ->
two-axis gimbal Rodrigues rotation (ops/gimbals.py:67-92, axis skews baked)
-> booster ignition latch / throttle floor+lag / fuel depletion
(ops/boosters.py:68-113) -> lagged read snapshot -> semi-implicit Euler ->
pad-aware impulse ground contact (core/integrator.py::ground_contact with
per-point ground heights — the landing task OBSERVES post-contact dynamics,
so unlike the fixedwing kernels the full normal+friction impulse model is
reproduced, not just detection).

Env fusion (envs/rocket_base.py base_step + envs/rocket_landing.py
_task_update): memo-lagged velocity/distance shifts, dense shaped reward,
pad touchdown / hard-landing / landed logic, base termination and the
done-freeze.

Deviations (same class as the other kernels): kernel-internal PRNG for
booster noise (same distribution, different stream); polynomial
atan2/asin. Parity with the XLA env is asserted in
tests/test_pallas_rocket.py (noise off).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from pyflyt_tpu.models import rocket
from pyflyt_tpu.ops import pallas_fixedwing as pfw
from pyflyt_tpu.ops import pallas_math as pmk

SUBLANES = 8
ROWS = 88

# ---- drone rows
_POS = 0     # 3: world ENU CoM position
_QUAT = 3    # 4: xyzw body->world
_LVEL = 7    # 3: world linear velocity (CoM)
_AVEL = 10   # 3: world angular velocity
_VIEW = 13   # 12: lagged [ang_vel_b, euler, lin_vel_b(base), base_pos]
_FLV = 25    # 12: lagged body-frame finlet local velocities (4 x 3)
_DLV = 37    # 3: lagged body-frame drag-link local velocity
_ACT = 40    # 4: finlet deflections
_FUEL = 44   # 1: booster ratio_fuel_remaining
_BTHR = 45   # 1: booster throttle
_IGN = 46    # 1: booster ignition latch (0/1)
_GBL = 47    # 2: gimbal state
_SP = 49     # 7: setpoint (= env action)
_CON = 56    # 1: any contact (ground or pad), last physics iter
_GCON = 57   # 1: ground-only contact flag, last physics iter
_PCON = 58   # 1: pad contact flag, last physics iter

# ---- env rows (landing task fusion)
_RWD = 59
_TERM = 60
_TRUNC = 61
_FATC = 62   # fatal_collision
_OOB = 63    # out_of_bounds
_CPLT = 64   # env_complete
_STEP = 65   # agent step count
_PADP = 66   # 3: pad position
_PFLAG = 69  # 1: pad_contact_flag (obs field)
_AV = 70     # 3: ang_vel memo (compute_state cache)
_LV = 73     # 3: lin_vel memo
_DIST = 76   # 3: distance memo (base_pos - pad)
_PAV = 79    # 3
_PLV = 82    # 3
_PDIST = 85  # 3


def pack_state(state: rocket.RocketState) -> Array:
    """Batched RocketState (batch (N,)) -> (ROWS, 8, N/8) f32."""
    n = state.body.pos.shape[0]
    assert n % SUBLANES == 0, n
    f32 = jnp.float32
    rows = [
        state.body.pos.T,
        state.body.quat.T,
        state.body.lin_vel.T,
        state.body.ang_vel.T,
        state.read.view.reshape(n, 12).T,
        state.read.finlet_local_vel.reshape(n, 12).T,
        state.read.drag_local_vel.T,
        state.actuation.T,
        state.booster.ratio_fuel_remaining.T,
        state.booster.throttle.T,
        state.booster.ignition_state.astype(f32).T,
        state.gimbal_state.reshape(n, 2).T,
        state.setpoint.T,
        state.contact.astype(f32)[None, :],
        state.ground_contact.astype(f32)[None, :],
        state.pad_contact.astype(f32)[None, :],
    ]
    packed = jnp.concatenate(rows, axis=0)
    pad = ROWS - packed.shape[0]
    packed = jnp.concatenate([packed, jnp.zeros((pad, n), packed.dtype)], axis=0)
    # no-pad default (models/rocket.py step(pad_position=None)): park the pad
    # far away so the kernel's always-on pad test never fires; the env wrapper
    # (envs/packed_rocket_landing.py) overwrites these rows with the real pad.
    packed = packed.at[_PADP : _PADP + 2].set(1e9)
    return packed.reshape(ROWS, SUBLANES, n // SUBLANES)


def unpack_state(packed: Array, template: rocket.RocketState) -> rocket.RocketState:
    """(ROWS, 8, N/8) -> RocketState. ``cmd`` keeps template values (it is
    recomputed from the setpoint at every control gate)."""
    packed = packed.reshape(ROWS, -1)
    g = lambda r, k: packed[r : r + k].T
    n = packed.shape[1]
    return template.replace(
        body=template.body.replace(
            pos=g(_POS, 3), quat=g(_QUAT, 4), lin_vel=g(_LVEL, 3),
            ang_vel=g(_AVEL, 3),
        ),
        read=rocket.RocketRead(
            view=g(_VIEW, 12).reshape(n, 4, 3),
            finlet_local_vel=g(_FLV, 12).reshape(n, 4, 3),
            drag_local_vel=g(_DLV, 3),
        ),
        actuation=g(_ACT, 4),
        booster=template.booster.replace(
            ratio_fuel_remaining=g(_FUEL, 1),
            throttle=g(_BTHR, 1),
            ignition_state=g(_IGN, 1) > 0.5,
        ),
        gimbal_state=g(_GBL, 2).reshape(n, 1, 2),
        setpoint=g(_SP, 7),
        contact=packed[_CON] > 0.5,
        ground_contact=packed[_GCON] > 0.5,
        pad_contact=packed[_PCON] > 0.5,
    )


def _bake(params: rocket.RocketParams, cfg: rocket.RocketConfig):
    """Concrete numpy views of every parameter the kernel bakes in."""
    p = lambda x: np.asarray(x, dtype=np.float64)
    s = params.finlets
    surf = []
    for i in range(rocket.NUM_FINLETS):
        aspect = float(p(s.aspect)[i])
        surf.append(
            dict(
                lu=p(s.lift_unit)[i], du=p(s.drag_unit)[i],
                tu=p(s.torque_unit)[i], pos=p(s.positions)[i],
                qa=0.5 * 1.225 * float(p(s.area)[i]),
                chord=float(p(s.chord)[i]),
                piAR_inv=1.0 / (np.pi * aspect),
                f2c=float(p(s.flap_to_chord)[i]),
                eta=float(p(s.eta)[i]),
                a0b=float(p(s.alpha_0_base)[i]),
                asPb=float(p(s.alpha_stall_P_base)[i]),
                asNb=float(p(s.alpha_stall_N_base)[i]),
                cl3d=float(p(s.Cl_alpha_3D)[i]),
                cd0=float(p(s.Cd_0)[i]),
                dlim_rad=float(np.deg2rad(p(s.deflection_limit)[i])),
                atau=float(p(s.aero_tau)[i]),
                tau=float(p(s.tau)[i]),
                stall_c=0.41 * (1.0 - np.exp(-17.0 / aspect)),
            )
        )
    b = params.booster
    # composite point masses: [base, fueltank(fuel), booster, 4 fins]
    # (models/rocket.py:130-166)
    m_base = float(p(params.base_mass))
    m_boost = float(p(params.booster_mass))
    m_fin = float(p(params.fin_mass))
    pt_positions = [
        p(params.base_position), p(params.fueltank_position),
        p(params.booster_position),
        *[p(params.fin_positions)[i] for i in range(4)],
    ]
    pt_masses = [m_base, None, m_boost, m_fin, m_fin, m_fin, m_fin]  # None=fuel
    m_dry = m_base + m_boost + 4 * m_fin
    P_dry = (
        m_base * pt_positions[0]
        + m_boost * pt_positions[2]
        + m_fin * sum(pt_positions[3:], np.zeros(3))
    )
    return dict(
        surf=surf,
        drag_const=p(params.drag_const),
        drag_pos=p(params.drag_position),
        finlet_map=p(params.finlet_map),
        contact_pts=p(params.contact_points),
        pt_positions=pt_positions,
        pt_masses=pt_masses,
        m_dry=m_dry,
        P_dry=P_dry,
        base_inertia=p(params.base_inertia),
        booster_inertia=p(params.booster_inertia),
        # booster scalars (n=1)
        b_pos=p(b.positions)[0],
        b_tu=p(b.thrust_unit)[0],
        b_tau=float(p(b.tau)[0]),
        b_total_fuel=float(p(b.total_fuel_mass)[0]),
        b_fuel_rate=float(p(b.max_fuel_rate)[0] / p(b.total_fuel_mass)[0]),
        b_max_inertia=p(b.max_inertia)[0],
        b_min_ratio=float(p(b.min_thrust)[0] / p(b.max_thrust)[0]),
        b_max_thrust=float(p(b.max_thrust)[0]),
        b_reignitable=bool(np.asarray(b.reignitable)[0]),
        b_noise=float(p(b.noise_ratio)[0]),
        # gimbal (n=1): axis skews baked; ranges in radians
        g_tau=float(p(params.gimbal.tau)[0]),
        g_range=p(params.gimbal.range_radians)[0],
        g_w1=p(params.gimbal.w1)[0],
        g_w2=p(params.gimbal.w2)[0],
        g_w1sq=p(params.gimbal.w1_squared)[0],
        g_w2sq=p(params.gimbal.w2_squared)[0],
        surf_tau=[float(v) for v in p(s.tau)],
        dt=cfg.physics_period,
        ratio=cfg.physics_control_ratio,
    )


def _mass_com(B, fm):
    """Composite (mass, com[3]) for fuel-mass register ``fm``
    (models/rocket.py:130-155 with the constant part folded)."""
    mass = B["m_dry"] + fm
    inv_mass = 1.0 / mass
    com = [
        (B["P_dry"][i] + fm * B["pt_positions"][1][i]) * inv_mass
        for i in range(3)
    ]
    return mass, inv_mass, com


def _composite_inertia(B, fm, fuel_ratio, com):
    """6 unique entries (ixx, iyy, izz, ixy, ixz, iyz) of the composite
    inertia about the register-valued CoM (models/rocket.py:156-166)."""
    ixx = float(B["base_inertia"][0] + B["booster_inertia"][0])
    iyy = float(B["base_inertia"][1] + B["booster_inertia"][1])
    izz = float(B["base_inertia"][2] + B["booster_inertia"][2])
    ixx = ixx + fuel_ratio * B["b_max_inertia"][0]
    iyy = iyy + fuel_ratio * B["b_max_inertia"][1]
    izz = izz + fuel_ratio * B["b_max_inertia"][2]
    ixy = None
    ixz = None
    iyz = None

    def acc(a, v):
        return v if a is None else a + v

    for m, pos in zip(B["pt_masses"], B["pt_positions"]):
        dx = float(pos[0]) - com[0]
        dy = float(pos[1]) - com[1]
        dz = float(pos[2]) - com[2]
        mm = fm if m is None else m
        dx2, dy2, dz2 = dx * dx, dy * dy, dz * dz
        ixx = ixx + mm * (dy2 + dz2)
        iyy = iyy + mm * (dx2 + dz2)
        izz = izz + mm * (dx2 + dy2)
        ixy = acc(ixy, -mm * dx * dy)
        ixz = acc(ixz, -mm * dx * dz)
        iyz = acc(iyz, -mm * dy * dz)
    return ixx, iyy, izz, ixy, ixz, iyz


def _sym_solve(I6, b):
    """x = I^-1 b for the symmetric register 3x3 (adjugate/det — the
    closed form of core/integrator.py::_solve3x3)."""
    ixx, iyy, izz, ixy, ixz, iyz = I6
    c00 = iyy * izz - iyz * iyz
    c01 = ixz * iyz - ixy * izz
    c02 = ixy * iyz - ixz * iyy
    c11 = ixx * izz - ixz * ixz
    c12 = ixy * ixz - ixx * iyz
    c22 = ixx * iyy - ixy * ixy
    det = ixx * c00 + ixy * c01 + ixz * c02
    inv_det = 1.0 / det
    return [
        (c00 * b[0] + c01 * b[1] + c02 * b[2]) * inv_det,
        (c01 * b[0] + c11 * b[1] + c12 * b[2]) * inv_det,
        (c02 * b[0] + c12 * b[1] + c22 * b[2]) * inv_det,
    ]


def _rodrigues_pair(B, a1, a2):
    """thrust direction = R1(a1) @ R2(a2) @ thrust_unit with baked axis
    skews (ops/gimbals.py:86-92)."""
    tu = B["b_tu"]
    s1, s2 = jnp.sin(a1), jnp.sin(a2)
    h1 = jnp.sin(a1 * 0.5)
    h2 = jnp.sin(a2 * 0.5)
    q1, q2 = 2.0 * h1 * h1, 2.0 * h2 * h2

    def apply(w, wsq, s, q, v):
        # v + s*(W v) + q*(W^2 v) with concrete W entries
        wv = [pmk.dot_const(v, w[i]) for i in range(3)]
        wsv = [pmk.dot_const(v, wsq[i]) for i in range(3)]
        return [v[i] + s * wv[i] + q * wsv[i] for i in range(3)]

    v = [jnp.zeros_like(a1) + float(tu[i]) for i in range(3)]
    v = apply(B["g_w2"], B["g_w2sq"], s2, q2, v)
    return apply(B["g_w1"], B["g_w1sq"], s1, q1, v)


def _build_kernel(
    params: rocket.RocketParams,
    cfg: rocket.RocketConfig,
    noisy: bool,
    env_fuse: dict | None = None,
):
    """Bakes the landing agent step. ``env_fuse`` keys: ``inner_steps``,
    ``max_steps``, ``max_displacement``, ``ceiling``, ``sparse``."""
    B = _bake(params, cfg)
    dt = B["dt"]
    g = 9.81

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, s_ref, o_ref):
        if noisy:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        S = s_ref[:]  # (ROWS, 8, TILE)

        pos = [S[_POS + i] for i in range(3)]
        quat = [S[_QUAT + i] for i in range(4)]
        lvel = [S[_LVEL + i] for i in range(3)]
        avel = [S[_AVEL + i] for i in range(3)]
        view = [S[_VIEW + i] for i in range(12)]
        flv = [S[_FLV + i] for i in range(12)]
        dlv = [S[_DLV + i] for i in range(3)]
        act = [S[_ACT + i] for i in range(4)]
        fuel = S[_FUEL]
        bthr = S[_BTHR]
        ign = S[_IGN]
        gbl = [S[_GBL], S[_GBL + 1]]
        sp = [S[_SP + i] for i in range(7)]
        contact = S[_CON]
        gcon = S[_GCON]
        pcon = S[_PCON]
        zero = jnp.zeros_like(fuel)

        # control map: the setpoint is written once per agent step and the
        # finlet mix is linear, so cmd is constant across the inner loop
        # (models/rocket.py:284-294, rocket.py:240-255 of the reference)
        fm_map = B["finlet_map"]
        fin_cmd = [
            jnp.clip(pmk.dot_const(sp[:3], fm_map[i]), -1.0, 1.0)
            for i in range(4)
        ]
        ign_cmd = sp[3]
        pwm_cmd = jnp.clip(sp[4], 0.0, 1.0)
        gbl_cmd = [jnp.clip(sp[5], -1.0, 1.0), jnp.clip(sp[6], -1.0, 1.0)]

        if env_fuse is not None:
            rwd = zero  # base reward is 0.0, no overwrite (rocket_base.py)
            term = S[_TERM]
            trunc = S[_TRUNC]
            fatc = S[_FATC]
            oobf = S[_OOB]
            cplt = S[_CPLT]
            stepc = S[_STEP]
            padp = [S[_PADP + i] for i in range(3)]
            pflag = S[_PFLAG]
            av = [S[_AV + i] for i in range(3)]
            lv = [S[_LV + i] for i in range(3)]
            dist = [S[_DIST + i] for i in range(3)]
            pav = [S[_PAV + i] for i in range(3)]
            plv = [S[_PLV + i] for i in range(3)]
            pdist = [S[_PDIST + i] for i in range(3)]
            trunc_hit = (stepc > float(env_fuse["max_steps"])).astype(
                jnp.float32
            )
            maxdisp2 = float(env_fuse["max_displacement"]) ** 2
            ceiling = float(env_fuse["ceiling"])
            n_aviary = int(env_fuse["inner_steps"])
        else:
            padp = [S[_PADP + i] for i in range(3)]
            n_aviary = 1

        for _a in range(n_aviary):
          if env_fuse is not None:
            done_before = jnp.minimum(term + trunc, 1.0)
            snap = (
                list(pos), list(quat), list(lvel), list(avel), list(view),
                list(flv), list(dlv), list(act), fuel, bthr, ign, list(gbl),
                contact, gcon, pcon, rwd, term, trunc, fatc, oobf, cplt,
                pflag, list(av), list(lv), list(dist), list(pav), list(plv),
                list(pdist),
            )
          any_ground = zero
          any_pad = zero

          for _it in range(B["ratio"]):
            # ---- pre-update composite CoM (drag + finlet lever arms use the
            # PRE-burn fuel load — models/rocket.py _current_com)
            fm_pre = fuel * B["b_total_fuel"]
            _, _, com_pre = _mass_com(B, fm_pre)

            # ---- body drag at the fuel-tank link (boring_bodies semantics,
            # models/rocket.py:324-329)
            f = [zero, zero, zero]
            t = [zero, zero, zero]
            for i in range(3):
                v = dlv[i]
                f[i] = f[i] - jnp.sign(v) * float(B["drag_const"][i]) * v * v
            r_drag = [float(B["drag_pos"][i]) - com_pre[i] for i in range(3)]
            t[0] = t[0] + r_drag[1] * f[2] - r_drag[2] * f[1]
            t[1] = t[1] + r_drag[2] * f[0] - r_drag[0] * f[2]
            t[2] = t[2] + r_drag[0] * f[1] - r_drag[1] * f[0]

            # ---- finlets: actuation lag + Khan wrench with register lever
            # arms (models/rocket.py:331-340)
            for si in range(4):
                act[si] = act[si] + (dt / B["surf_tau"][si]) * (
                    fin_cmd[si] - act[si]
                )
                Ssurf = B["surf"][si]
                fn, fp, qcm = pfw.surface_normal_forward(
                    Ssurf, act[si], flv[3 * si : 3 * si + 3]
                )
                pmk.add_scaled(f, fn, Ssurf["lu"])
                pmk.add_scaled(f, fp, Ssurf["du"])
                pmk.add_scaled(t, qcm, Ssurf["tu"])
                r_s = [float(Ssurf["pos"][i]) - com_pre[i] for i in range(3)]
                # t += r x (fn*lu + fp*du) with concrete unit vectors
                fsur = [zero, zero, zero]
                pmk.add_scaled(fsur, fn, Ssurf["lu"])
                pmk.add_scaled(fsur, fp, Ssurf["du"])
                t[0] = t[0] + r_s[1] * fsur[2] - r_s[2] * fsur[1]
                t[1] = t[1] + r_s[2] * fsur[0] - r_s[0] * fsur[2]
                t[2] = t[2] + r_s[0] * fsur[1] - r_s[1] * fsur[0]

            # ---- gimbal lag + rotation (ops/gimbals.py:82-92)
            gbl = [
                gbl[i] + (dt / B["g_tau"]) * (gbl_cmd[i] - gbl[i])
                for i in range(2)
            ]
            a1 = gbl[0] * float(B["g_range"][0])
            a2 = gbl[1] * float(B["g_range"][1])
            tdir = _rodrigues_pair(B, a1, a2)

            # ---- booster update (ops/boosters.py:68-113)
            if B["b_reignitable"]:
                ign = (ign_cmd > 0.5).astype(jnp.float32)
            else:
                ign = jnp.maximum(ign, (ign_cmd > 0.5).astype(jnp.float32))
            target = ign * (
                pwm_cmd * (1.0 - B["b_min_ratio"]) + B["b_min_ratio"]
            )
            bthr = bthr + (dt / B["b_tau"]) * (target - bthr)
            if noisy:
                bthr = bthr + pmk.make_normal(bthr.shape) * bthr * B["b_noise"]
            bthr = bthr * (fuel > 0.0).astype(jnp.float32)
            fuel = jnp.clip(fuel - bthr * B["b_fuel_rate"] * dt, 0.0, 1.0)
            thrust = bthr * B["b_max_thrust"]

            # ---- post-burn composite mass properties
            fm = fuel * B["b_total_fuel"]
            mass, inv_mass, com = _mass_com(B, fm)
            I6 = _composite_inertia(B, fm, fuel, com)

            # boost wrench (models/rocket.py:359-366)
            fb = [thrust * tdir[i] for i in range(3)]
            r_b = [float(B["b_pos"][i]) - com[i] for i in range(3)]
            f = [f[i] + fb[i] for i in range(3)]
            t[0] = t[0] + r_b[1] * fb[2] - r_b[2] * fb[1]
            t[1] = t[1] + r_b[2] * fb[0] - r_b[0] * fb[2]
            t[2] = t[2] + r_b[0] * fb[1] - r_b[1] * fb[0]

            # ---- rotation matrix + NEW lagged read (pre-integration state,
            # post-burn CoM — models/rocket.py:368-370, update_state)
            R = pmk.quat_rotmat(quat)
            r00, r01, r02, r10, r11, r12, r20, r21, r22 = R
            Rcom = [
                r00 * com[0] + r01 * com[1] + r02 * com[2],
                r10 * com[0] + r11 * com[1] + r12 * com[2],
                r20 * com[0] + r21 * com[1] + r22 * com[2],
            ]
            base_pos = [pos[i] - Rcom[i] for i in range(3)]
            bvx = lvel[0] - (avel[1] * Rcom[2] - avel[2] * Rcom[1])
            bvy = lvel[1] - (avel[2] * Rcom[0] - avel[0] * Rcom[2])
            bvz = lvel[2] - (avel[0] * Rcom[1] - avel[1] * Rcom[0])
            lvb = [
                r00 * bvx + r10 * bvy + r20 * bvz,
                r01 * bvx + r11 * bvy + r21 * bvz,
                r02 * bvx + r12 * bvy + r22 * bvz,
            ]
            avb = [
                r00 * avel[0] + r10 * avel[1] + r20 * avel[2],
                r01 * avel[0] + r11 * avel[1] + r21 * avel[2],
                r02 * avel[0] + r12 * avel[1] + r22 * avel[2],
            ]
            roll, pitch, yaw = pmk.quat_to_euler(quat)
            new_view = [
                avb[0], avb[1], avb[2], roll, pitch, yaw,
                lvb[0], lvb[1], lvb[2],
                base_pos[0], base_pos[1], base_pos[2],
            ]

            def local_vel_at(px, py, pz):
                # R (p - com), then v = lvel + avel x r, then R^T v
                rx = px - com[0]
                ry = py - com[1]
                rz = pz - com[2]
                rwx = r00 * rx + r01 * ry + r02 * rz
                rwy = r10 * rx + r11 * ry + r12 * rz
                rwz = r20 * rx + r21 * ry + r22 * rz
                vx = lvel[0] + (avel[1] * rwz - avel[2] * rwy)
                vy = lvel[1] + (avel[2] * rwx - avel[0] * rwz)
                vz = lvel[2] + (avel[0] * rwy - avel[1] * rwx)
                return [
                    r00 * vx + r10 * vy + r20 * vz,
                    r01 * vx + r11 * vy + r21 * vz,
                    r02 * vx + r12 * vy + r22 * vz,
                ]

            new_flv = []
            for si in range(4):
                p_s = B["surf"][si]["pos"]
                new_flv += local_vel_at(
                    float(p_s[0]), float(p_s[1]), float(p_s[2])
                )
            new_dlv = local_vel_at(
                float(B["drag_pos"][0]), float(B["drag_pos"][1]),
                float(B["drag_pos"][2]),
            )

            # ---- integrate (semi-implicit Euler, register-valued full
            # inertia — core/integrator.py::step)
            fwx = r00 * f[0] + r01 * f[1] + r02 * f[2]
            fwy = r10 * f[0] + r11 * f[1] + r12 * f[2]
            fwz = r20 * f[0] + r21 * f[1] + r22 * f[2]
            lvel = [
                lvel[0] + dt * (fwx * inv_mass),
                lvel[1] + dt * (fwy * inv_mass),
                lvel[2] + dt * (fwz * inv_mass - g),
            ]
            ob = avb  # R^T omega_w
            ixx, iyy, izz, ixy, ixz, iyz = I6
            Iw = [
                ixx * ob[0] + ixy * ob[1] + ixz * ob[2],
                ixy * ob[0] + iyy * ob[1] + iyz * ob[2],
                ixz * ob[0] + iyz * ob[1] + izz * ob[2],
            ]
            gy = [
                ob[1] * Iw[2] - ob[2] * Iw[1],
                ob[2] * Iw[0] - ob[0] * Iw[2],
                ob[0] * Iw[1] - ob[1] * Iw[0],
            ]
            rhs = [t[i] - gy[i] for i in range(3)]
            dob = _sym_solve(I6, rhs)
            ob = [ob[i] + dt * dob[i] for i in range(3)]
            avel = [
                r00 * ob[0] + r01 * ob[1] + r02 * ob[2],
                r10 * ob[0] + r11 * ob[1] + r12 * ob[2],
                r20 * ob[0] + r21 * ob[1] + r22 * ob[2],
            ]
            pos = [pos[i] + dt * lvel[i] for i in range(3)]
            quat = pmk.quat_integrate(quat, avel, dt)

            # ---- pad-aware impulse ground contact
            # (core/integrator.py::ground_contact with per-point heights from
            # models/rocket.py::_pad_ground_heights: raised 2 m disc)
            Rn = pmk.quat_rotmat(quat)
            n00, n01, n02, n10, n11, n12, n20, n21, n22 = Rn
            pad_top = padp[2] + 0.05
            depth_sum = zero
            max_depth = zero
            cx_acc = zero
            cy_acc = zero
            cz_acc = zero
            pad_pen = zero
            gnd_pen = zero
            for cp in B["contact_pts"]:
                px = float(cp[0]) - com[0]
                py = float(cp[1]) - com[1]
                pz = float(cp[2]) - com[2]
                wx = n00 * px + n01 * py + n02 * pz
                wy = n10 * px + n11 * py + n12 * pz
                wz = n20 * px + n21 * py + n22 * pz
                gx = pos[0] + wx
                gy_ = pos[1] + wy
                gz = pos[2] + wz
                dxp = gx - padp[0]
                dyp = gy_ - padp[1]
                on_pad = (dxp * dxp + dyp * dyp < 4.0).astype(jnp.float32)
                h = on_pad * pad_top
                depth = h - gz
                pen = (depth > 0.0).astype(jnp.float32)
                pad_pen = jnp.maximum(pad_pen, on_pad * pen)
                gnd_pen = jnp.maximum(gnd_pen, (1.0 - on_pad) * pen)
                w = jnp.maximum(depth, 0.0)
                depth_sum = depth_sum + w
                max_depth = jnp.maximum(max_depth, depth)
                cx_acc = cx_acc + w * wx
                cy_acc = cy_acc + w * wy
                cz_acc = cz_acc + w * wz
            hit = jnp.minimum(pad_pen + gnd_pen, 1.0)
            inv_wsum = 1.0 / jnp.maximum(depth_sum, 1e-12)
            rwx = cx_acc * inv_wsum
            rwy = cy_acc * inv_wsum
            rwz = cz_acc * inv_wsum
            # world-frame inverse inertia approx: 1 / ((R*R) @ diag(I))
            iw_inv = [
                1.0 / (
                    Rn[3 * i + 0] * Rn[3 * i + 0] * ixx
                    + Rn[3 * i + 1] * Rn[3 * i + 1] * iyy
                    + Rn[3 * i + 2] * Rn[3 * i + 2] * izz
                )
                for i in range(3)
            ]
            vpx = lvel[0] + (avel[1] * rwz - avel[2] * rwy)
            vpy = lvel[1] + (avel[2] * rwx - avel[0] * rwz)
            vpz = lvel[2] + (avel[0] * rwy - avel[1] * rwx)
            # normal impulse (restitution 0)
            k_n = inv_mass + (rwy * rwy * iw_inv[0] + rwx * rwx * iw_inv[1])
            # rxn = r x z = (rwy, -rwx, 0)
            j_n = jnp.maximum(-vpz / k_n, 0.0)
            j_n = j_n * hit * (vpz < 0.0).astype(jnp.float32)
            # friction impulse (Coulomb clamp, mu = 0.5)
            vt = jnp.sqrt(vpx * vpx + vpy * vpy)
            inv_vt = 1.0 / jnp.maximum(vt, 1e-9)
            tx = vpx * inv_vt
            ty = vpy * inv_vt
            # rxt = r x (tx, ty, 0) = (-rwz*ty, rwz*tx, rwx*ty - rwy*tx)
            rxt0 = -rwz * ty
            rxt1 = rwz * tx
            rxt2 = rwx * ty - rwy * tx
            k_t = inv_mass + (
                rxt0 * rxt0 * iw_inv[0]
                + rxt1 * rxt1 * iw_inv[1]
                + rxt2 * rxt2 * iw_inv[2]
            )
            j_t = jnp.minimum(vt / k_t, 0.5 * j_n) * hit
            jx = -j_t * tx
            jy = -j_t * ty
            jz = j_n
            dlx = jx * inv_mass
            dly = jy * inv_mass
            dlz = jz * inv_mass
            # dω = (r x j) ⊙ iw_inv
            dax = (rwy * jz - rwz * jy) * iw_inv[0]
            day = (rwz * jx - rwx * jz) * iw_inv[1]
            daz = (rwx * jy - rwy * jx) * iw_inv[2]
            lvel = [
                lvel[0] + hit * dlx, lvel[1] + hit * dly, lvel[2] + hit * dlz,
            ]
            avel = [
                avel[0] + hit * dax, avel[1] + hit * day, avel[2] + hit * daz,
            ]
            pos[2] = pos[2] + hit * jnp.maximum(max_depth, 0.0)

            contact = hit
            gcon = gnd_pen
            pcon = pad_pen
            any_ground = jnp.maximum(any_ground, gnd_pen)
            any_pad = jnp.maximum(any_pad, pad_pen)
            view = new_view
            flv = new_flv
            dlv = new_dlv

          if env_fuse is not None:
            # ---- fused task update (envs/rocket_landing.py _task_update +
            # envs/rocket_base.py base_term_trunc) on the candidate state,
            # then the done-freeze (rocket_base.py base_step inner)
            # compute_state memo shift (rocket_landing_env.py:137-156)
            pav_c, plv_c, pdist_c = av, lv, dist
            av_c = view[0:3]
            lv_c = view[6:9]
            dist_c = [view[9 + i] - padp[i] for i in range(3)]

            # base_term_trunc (rocket_base_env.py:277-306; no reward overwrite)
            trunc_c = jnp.minimum(trunc + trunc_hit, 1.0)
            below = (view[11] < 0.0).astype(jnp.float32)
            fatal = jnp.minimum(any_ground + below, 1.0)
            xy2 = view[9] * view[9] + view[10] * view[10]
            oob_i = jnp.minimum(
                (xy2 > maxdisp2).astype(jnp.float32)
                + (view[11] > ceiling).astype(jnp.float32),
                1.0,
            )
            term_c = jnp.minimum(term + fatal + oob_i, 1.0)
            fatc_c = jnp.minimum(fatc + fatal, 1.0)
            oobf_c = jnp.minimum(oobf + oob_i, 1.0)

            rwd_c = rwd
            if not env_fuse["sparse"]:
                d_xy = jnp.sqrt(dist_c[0] * dist_c[0] + dist_c[1] * dist_c[1])
                pd_xy = jnp.sqrt(
                    pdist_c[0] * pdist_c[0] + pdist_c[1] * pdist_c[1]
                )
                tilt = jnp.sqrt(view[3] * view[3] + view[4] * view[4])
                rwd_c = rwd_c + (
                    -5.0
                    + 2.0 / (d_xy + 0.1)
                    + 100.0 * (pd_xy - d_xy)
                    - jnp.abs(av_c[2])
                    - 3.0 * tilt
                )

            # pad touchdown logic (rocket_landing_env.py:229-258)
            rwd_c = rwd_c + 20.0 * any_pad
            pflag_c = any_pad
            pav_n = jnp.sqrt(
                pav_c[0] * pav_c[0] + pav_c[1] * pav_c[1] + pav_c[2] * pav_c[2]
            )
            plv_n = jnp.sqrt(
                plv_c[0] * plv_c[0] + plv_c[1] * plv_c[1] + plv_c[2] * plv_c[2]
            )
            tilt2 = jnp.sqrt(view[3] * view[3] + view[4] * view[4])
            hard = jnp.minimum(
                (pav_n > 0.35).astype(jnp.float32)
                + (plv_n > 1.0).astype(jnp.float32),
                1.0,
            )
            landed = (
                (pav_n < 0.02).astype(jnp.float32)
                * (plv_n < 0.02).astype(jnp.float32)
                * (tilt2 < 0.1).astype(jnp.float32)
            )
            fatal_touch = any_pad * hard
            complete = any_pad * (1.0 - hard) * landed
            rwd_c = rwd_c + 500.0 * complete
            term_c = jnp.minimum(term_c + fatal_touch + complete, 1.0)
            fatc_c = jnp.minimum(fatc_c + fatal_touch, 1.0)
            cplt_c = jnp.minimum(cplt + complete, 1.0)

            keep = done_before
            sel = lambda old_v, new_v: keep * old_v + (1.0 - keep) * new_v
            (s_pos, s_quat, s_lvel, s_avel, s_view, s_flv, s_dlv, s_act,
             s_fuel, s_bthr, s_ign, s_gbl, s_con, s_gcon, s_pcon, s_rwd,
             s_term, s_trunc, s_fatc, s_oobf, s_cplt, s_pflag, s_av, s_lv,
             s_dist, s_pav, s_plv, s_pdist) = snap
            pos = [sel(o, n_) for o, n_ in zip(s_pos, pos)]
            quat = [sel(o, n_) for o, n_ in zip(s_quat, quat)]
            lvel = [sel(o, n_) for o, n_ in zip(s_lvel, lvel)]
            avel = [sel(o, n_) for o, n_ in zip(s_avel, avel)]
            view = [sel(o, n_) for o, n_ in zip(s_view, view)]
            flv = [sel(o, n_) for o, n_ in zip(s_flv, flv)]
            dlv = [sel(o, n_) for o, n_ in zip(s_dlv, dlv)]
            act = [sel(o, n_) for o, n_ in zip(s_act, act)]
            fuel = sel(s_fuel, fuel)
            bthr = sel(s_bthr, bthr)
            ign = sel(s_ign, ign)
            gbl = [sel(o, n_) for o, n_ in zip(s_gbl, gbl)]
            contact = sel(s_con, contact)
            gcon = sel(s_gcon, gcon)
            pcon = sel(s_pcon, pcon)
            rwd = sel(s_rwd, rwd_c)
            term = sel(s_term, term_c)
            trunc = sel(s_trunc, trunc_c)
            fatc = sel(s_fatc, fatc_c)
            oobf = sel(s_oobf, oobf_c)
            cplt = sel(s_cplt, cplt_c)
            pflag = sel(s_pflag, pflag_c)
            av = [sel(o, n_) for o, n_ in zip(s_av, av_c)]
            lv = [sel(o, n_) for o, n_ in zip(s_lv, lv_c)]
            dist = [sel(o, n_) for o, n_ in zip(s_dist, dist_c)]
            pav = [sel(o, n_) for o, n_ in zip(s_pav, pav_c)]
            plv = [sel(o, n_) for o, n_ in zip(s_plv, plv_c)]
            pdist = [sel(o, n_) for o, n_ in zip(s_pdist, pdist_c)]

        # ---- pack back
        out = [None] * ROWS
        for i in range(3):
            out[_POS + i] = pos[i]
            out[_LVEL + i] = lvel[i]
            out[_AVEL + i] = avel[i]
            out[_DLV + i] = dlv[i]
        for i in range(4):
            out[_QUAT + i] = quat[i]
            out[_ACT + i] = act[i]
        for i in range(12):
            out[_VIEW + i] = view[i]
            out[_FLV + i] = flv[i]
        out[_FUEL] = fuel
        out[_BTHR] = bthr
        out[_IGN] = ign
        out[_GBL] = gbl[0]
        out[_GBL + 1] = gbl[1]
        for i in range(7):
            out[_SP + i] = sp[i]
        out[_CON] = contact
        out[_GCON] = gcon
        out[_PCON] = pcon
        for i in range(3):
            out[_PADP + i] = padp[i]
        if env_fuse is not None:
            out[_RWD] = rwd
            out[_TERM] = term
            out[_TRUNC] = trunc
            out[_FATC] = fatc
            out[_OOB] = oobf
            out[_CPLT] = cplt
            out[_STEP] = stepc + 1.0
            out[_PFLAG] = pflag
            for i in range(3):
                out[_AV + i] = av[i]
                out[_LV + i] = lv[i]
                out[_DIST + i] = dist[i]
                out[_PAV + i] = pav[i]
                out[_PLV + i] = plv[i]
                out[_PDIST + i] = pdist[i]
        else:
            out[_RWD] = any_ground  # spare rows carry the step's contact ORs
            out[_TERM] = any_pad
        for i in range(ROWS):  # padding rows
            if out[i] is None:
                out[i] = zero
        o_ref[:] = jnp.stack(out, axis=0)

    return kernel


def _grid_call(kernel, packed: Array, seed: Array, tile: int) -> Array:
    return pmk.grid_call(kernel, packed, seed, tile)


def packed_step(
    packed: Array,
    seed: Array,
    params: rocket.RocketParams,
    cfg: rocket.RocketConfig,
    noisy: bool = True,
    tile: int = 256,
) -> Array:
    """One aviary step on the packed (ROWS, 8, N/8) state (pad position read
    from rows _PADP). Row ``_RWD``/``_TERM`` of the output carry the step's
    any-ground / any-pad contact flags. ``params`` must be CONCRETE."""
    kernel = _build_kernel(params, cfg, noisy)
    return _grid_call(kernel, packed, seed, tile)


def packed_landing_step(
    packed: Array,
    seed: Array,
    params: rocket.RocketParams,
    cfg: rocket.RocketConfig,
    noisy: bool,
    inner_steps: int,
    max_steps: int,
    max_displacement: float,
    ceiling: float,
    sparse: bool = False,
    tile: int = 256,
) -> Array:
    """One FULL Rocket-Landing agent step on the packed state (see
    envs/packed_rocket_landing.py)."""
    kernel = _build_kernel(
        params, cfg, noisy,
        env_fuse=dict(
            inner_steps=inner_steps, max_steps=max_steps,
            max_displacement=max_displacement, ceiling=ceiling, sparse=sparse,
        ),
    )
    return _grid_call(kernel, packed, seed, tile)
