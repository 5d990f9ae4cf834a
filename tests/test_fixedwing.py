"""Fixedwing model tests: composite inertia, Khan-model aero, flight behavior
(reference: PyFlyt/core/drones/fixedwing.py, abstractions/lifting_surfaces.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pyflyt_tpu.models import fixedwing
from pyflyt_tpu.ops import lifting_surfaces as ls

CFG = fixedwing.FixedwingConfig(noisy_motors=False)
PARAMS = fixedwing.build_params(CFG)


def test_composite_mass_com():
    """Point-mass composite of the URDF links: total 2.35 kg, CoM x ≈ −0.453."""
    np.testing.assert_allclose(float(PARAMS.mass), 2.35, rtol=1e-6)
    com = np.asarray(PARAMS.com_offset)
    np.testing.assert_allclose(com[0], -1.065 / 2.35, rtol=1e-5)
    np.testing.assert_allclose(com[1], 0.0, atol=1e-8)
    np.testing.assert_allclose(com[2], 0.0075 / 2.35, rtol=1e-4)
    # inertia positive definite; Izz largest (x- and y-spread both contribute)
    I = np.asarray(PARAMS.inertia, dtype=np.float64)
    assert np.all(np.linalg.eigvalsh(I) > 0)
    assert I[2, 2] > I[0, 0] and I[2, 2] > I[1, 1]


def _reference_aero_scalar(alpha, actuation, i):
    """Scalar numpy port of the reference kernel
    (lifting_surfaces.py:337-435) for surface index i."""
    p = PARAMS.surfaces
    g = lambda a: float(np.asarray(a)[i])
    aspect, flap_to_chord = g(p.aspect), g(p.flap_to_chord)
    aero_tau, eta = g(p.aero_tau), g(p.eta)
    Cl_alpha_3D = g(p.Cl_alpha_3D)
    a_sp, a_0b, a_sn = (
        g(p.alpha_stall_P_base), g(p.alpha_0_base), g(p.alpha_stall_N_base),
    )
    Cd_0, defl_lim = g(p.Cd_0), g(p.deflection_limit)

    deflection = np.deg2rad(actuation * defl_lim)
    delta_Cl = Cl_alpha_3D * aero_tau * eta * deflection
    delta_Cl_max = flap_to_chord * delta_Cl
    Cl_max_P = Cl_alpha_3D * (a_sp - a_0b) + delta_Cl_max
    Cl_max_N = Cl_alpha_3D * (a_sn - a_0b) + delta_Cl_max
    alpha_0 = a_0b - (delta_Cl / Cl_alpha_3D)
    alpha_stall_P = alpha_0 + (Cl_max_P / Cl_alpha_3D)
    alpha_stall_N = alpha_0 + (Cl_max_N / Cl_alpha_3D)

    if alpha_stall_N < alpha < alpha_stall_P:
        Cl = Cl_alpha_3D * (alpha - alpha_0)
        alpha_i = Cl / (np.pi * aspect)
        ae = alpha - alpha_0 - alpha_i
        CT = Cd_0 * np.cos(ae)
        CN = (Cl + (CT * np.sin(ae))) / np.cos(ae)
        Cd = (CN * np.sin(ae)) + (CT * np.cos(ae))
        CM = -CN * (0.25 - (0.175 * (1.0 - ((2.0 * ae) / np.pi))))
        return Cl, Cd, CM
    if alpha > 0.0:
        Cl_stall = Cl_alpha_3D * (alpha_stall_P - alpha_0)
        ai_at_stall = Cl_stall / (np.pi * aspect)
        alpha_i = np.interp(alpha, [alpha_stall_P, np.pi / 2.0], [ai_at_stall, 0.0])
    else:
        Cl_stall = Cl_alpha_3D * (alpha_stall_N - alpha_0)
        ai_at_stall = Cl_stall / (np.pi * aspect)
        alpha_i = np.interp(alpha, [-np.pi / 2.0, alpha_stall_N], [0.0, ai_at_stall])
    ae = alpha - alpha_0 - alpha_i
    Cd_90 = ((-4.26e-2) * (deflection**2)) + (2.1e-1 * deflection) + 1.98
    CN = (
        Cd_90
        * np.sin(ae)
        * (1.0 / (0.56 + 0.44 * abs(np.sin(ae))) - 0.41 * (1.0 - np.exp(-17.0 / aspect)))
    )
    CT = 0.5 * Cd_0 * np.cos(ae)
    Cl = (CN * np.cos(ae)) - (CT * np.sin(ae))
    Cd = (CN * np.sin(ae)) + (CT * np.cos(ae))
    CM = -CN * (0.25 - (0.175 * (1.0 - ((2.0 * abs(ae)) / np.pi))))
    return Cl, Cd, CM


def test_aero_coefficients_match_reference_formulas():
    """Vectorized (Cl, Cd, CM) equals the scalar reference port across the
    full AoA range incl. both stall regimes and deflection."""
    for actuation in (0.0, 0.5, -0.8):
        for alpha in np.linspace(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, 41):
            alphas = jnp.full((5,), alpha, dtype=jnp.float32)
            acts = jnp.full((5,), actuation, dtype=jnp.float32)
            Cl, Cd, CM = ls.aero_coefficients(alphas, acts, PARAMS.surfaces)
            for i in range(5):
                cl_r, cd_r, cm_r = _reference_aero_scalar(alpha, actuation, i)
                np.testing.assert_allclose(float(Cl[i]), cl_r, rtol=2e-4, atol=2e-5)
                np.testing.assert_allclose(float(Cd[i]), cd_r, rtol=2e-4, atol=2e-5)
                np.testing.assert_allclose(float(CM[i]), cm_r, rtol=2e-4, atol=2e-5)


def test_stall_drops_lift():
    """Past the positive stall angle the lift slope collapses."""
    p = PARAMS.surfaces
    i = 4  # main wing, stall at 14 deg
    pre = jnp.asarray([np.deg2rad(10.0)] * 5)
    post = jnp.asarray([np.deg2rad(20.0)] * 5)
    zero = jnp.zeros(5)
    Cl_pre, _, _ = ls.aero_coefficients(pre, zero, p)
    Cl_post, _, _ = ls.aero_coefficients(post, zero, p)
    assert float(Cl_post[i]) < float(Cl_pre[i])


def test_aoa_sign_convention():
    """Descending air through the wing (downward local velocity component)
    gives positive AoA: alpha = atan2(-v·lift, v·fwd)."""
    v = jnp.tile(jnp.asarray([10.0, 0.0, -1.0]), (5, 1))
    alpha, speed = ls.aoa_freestream(v, PARAMS.surfaces)
    assert float(alpha[4]) > 0.0  # main wing
    np.testing.assert_allclose(float(speed[0]), np.sqrt(101.0), rtol=1e-6)


def test_glide_generates_lift():
    """At 20 m/s forward the wing must carry most of the weight: vertical
    acceleration magnitude far below free-fall."""
    st = fixedwing.init_state(PARAMS, CFG, jnp.asarray([0.0, 0.0, 50.0]), jnp.zeros(3))
    st = st.replace(setpoint=jnp.asarray([0.0, 0.0, 0.0, 0.0]))

    def f(s, _):
        s, _ = fixedwing.step(s, PARAMS, CFG, 0)
        return s, s.body.lin_vel[2]

    st, vz = jax.lax.scan(f, st, None, length=120)  # 0.5 s
    # free fall would reach vz = -4.9; the (untrimmed, slightly nose-heavy)
    # wing must carry most of the weight
    assert float(vz[-1]) > -3.5
    assert not np.isnan(np.asarray(st.body.pos)).any()


def test_full_throttle_accelerates():
    st = fixedwing.init_state(PARAMS, CFG, jnp.asarray([0.0, 0.0, 50.0]), jnp.zeros(3))
    st = st.replace(setpoint=jnp.asarray([0.0, 0.0, 0.0, 1.0]))

    def f(s, _):
        s, _ = fixedwing.step(s, PARAMS, CFG, 0)
        return s, None

    st, _ = jax.lax.scan(f, st, None, length=240)  # 1 s
    assert float(st.read.view[2, 0]) > 20.0  # forward body speed grew


def test_roll_command_rolls():
    """Positive aileron-pair command induces roll (differential lift)."""
    st = fixedwing.init_state(PARAMS, CFG, jnp.asarray([0.0, 0.0, 50.0]), jnp.zeros(3))
    st = st.replace(setpoint=jnp.asarray([0.5, 0.0, 0.0, 0.5]))

    def f(s, _):
        s, _ = fixedwing.step(s, PARAMS, CFG, 0)
        return s, None

    st, _ = jax.lax.scan(f, st, None, length=60)
    roll = float(st.read.view[1, 0])
    assert abs(roll) > 0.05  # rolled away from level


def test_mode_assist_map():
    """mode 0: cmd = setpoint[[0,0,1,1,2,3]] * [1,-1,1,-1,0,1]
    (fixedwing.py:137-140, 234-238)."""
    st = fixedwing.init_state(PARAMS, CFG, jnp.zeros(3), jnp.zeros(3))
    st = st.replace(setpoint=jnp.asarray([0.3, -0.2, 0.9, 0.7]))
    st = fixedwing.update_control(st, PARAMS, CFG, 0)
    np.testing.assert_allclose(
        np.asarray(st.cmd), [0.3, -0.3, -0.2, 0.2, 0.0, 0.7], atol=1e-7
    )


def test_ground_contact_detected():
    """Spawning at low altitude without lift ends in ground contact."""
    st = fixedwing.init_state(PARAMS, CFG, jnp.asarray([0.0, 0.0, 0.3]), jnp.zeros(3))
    cfg = dataclasses_replace_starting_velocity(CFG, (0.0, 0.0, 0.0))
    st = fixedwing.init_state(PARAMS, cfg, jnp.asarray([0.0, 0.0, 0.3]), jnp.zeros(3))
    contact_any = jnp.zeros((), bool)

    def f(carry, _):
        s, c = carry
        s, contact = fixedwing.step(s, PARAMS, cfg, 0)
        return (s, c | contact), None

    (st, contact_any), _ = jax.lax.scan(f, (st, contact_any), None, length=120)
    assert bool(contact_any)


def dataclasses_replace_starting_velocity(cfg, vel):
    import dataclasses

    return dataclasses.replace(cfg, starting_velocity=vel)
