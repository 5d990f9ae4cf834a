"""Pallas TPU kernel: fused 2-agent Fixedwing dogfight agent step.

The fixedwing treatment (ops/pallas_fixedwing.py) applied to the ARENA: both
aircraft of a match live in the same lane as two stacked drone row banks, so
every piece of cross-drone engagement math — separation, gun-cone angles,
hits, health, mutual collision — is row-wise register arithmetic with zero
cross-lane traffic. One kernel call runs the WHOLE dogfight agent step
(``env_step_ratio`` aviary steps x ``physics_control_ratio`` physics
iterations per drone, engagement rewards with the reference's one-step memo
lag, termination/truncation accumulation) on a folded ``(128, 8, N/8)`` state
where ``N`` is the number of arenas.

Reference semantics covered (cited against the upstream tree; the XLA
re-implementation with per-line citations is envs/ma_fixedwing_dogfight.py,
itself built against
/root/reference/PyFlyt/pz_envs/fixedwing_envs/ma_fixedwing_dogfight_env.py):

- gun origin 0.35 m behind the CG along the forward vector (:178-179)
- hit iff angle < lethal_angle AND distance < lethal_distance AND chasing
  (:199-204); health -= damage_per_hit per hit (:206)
- engagement rewards (:265-295) computed from the PREVIOUS aviary step's
  hits/angles/distance (the reference's reward memo fires before its state
  memo, :306-313 before :259-263)
- -3000 on collision (ground | mutual sphere proximity) or out-of-dome, term
  on either or on fewer than 2 agents at step start (:316-320)
- the 30-dim observation pair is assembled OUTSIDE the kernel
  (envs/packed_dogfight.py) from the final packed state — the per-aviary-step
  observation cache of the reference is only ever read after the last inner
  step, so only health/angle/distance memos live in kernel registers.

Deviations (same class as the quadx/fixedwing kernels): kernel-internal PRNG
for motor noise (same distribution, different stream); detection-grade ground
contact; polynomial atan2/asin (and acos = pi/2 - asin for the gun angle).

Parity with the vmapped XLA env (noise off) is asserted in
tests/test_pallas_dogfight.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from pyflyt_tpu.models import fixedwing
from pyflyt_tpu.ops import pallas_fixedwing as pfw
from pyflyt_tpu.ops import pallas_math as pmk

SUBLANES = 8
D_ROWS = 53  # one drone bank: pfw rows _POS.._CON (52) inclusive
_D0 = 0
_D1 = D_ROWS

# ---- arena/env rows
_HP = 2 * D_ROWS  # 2: health [d0, d1]
_ANG = _HP + 2    # 2: current_angles memo
_PANG = _ANG + 2  # 2: prev_angles memo (one aviary step older)
_HIT = _PANG + 2  # 2: current_hits memo (0/1)
_DIST = _HIT + 2  # 1: current_distance memo
_PDIST = _DIST + 1  # 1: prev_distance memo
_TERM = _PDIST + 1  # 2
_TRUNC = _TERM + 2  # 2
_RWD = _TRUNC + 2   # 2: reward accumulated over the agent step
_COLLF = _RWD + 2   # 2: any-collision info flag (this step)
_OOBF = _COLLF + 2  # 2: any-out-of-bounds info flag (this step)
_OTHD = _OOBF + 2   # 1: other-dead flag (wrapper-computed at step start)
_STEPC = _OTHD + 1  # 1: agent step count (pre-increment)

ROWS = 128
assert _STEPC + 1 <= ROWS


def _bank_read(S, base):
    """Row registers of one drone bank (pallas_fixedwing layout)."""
    return {
        "pos": [S[base + pfw._POS + i] for i in range(3)],
        "quat": [S[base + pfw._QUAT + i] for i in range(4)],
        "lvel": [S[base + pfw._LVEL + i] for i in range(3)],
        "avel": [S[base + pfw._AVEL + i] for i in range(3)],
        "view": [S[base + pfw._VIEW + i] for i in range(12)],
        "slv": [S[base + pfw._SLV + i] for i in range(15)],
        "act": [S[base + pfw._ACT + i] for i in range(5)],
        "thr": S[base + pfw._THR],
        "sp": [S[base + pfw._SP + i] for i in range(6)],
        "contact": S[base + pfw._CON],
    }


def _bank_write(out, base, d):
    for i in range(3):
        out[base + pfw._POS + i] = d["pos"][i]
        out[base + pfw._LVEL + i] = d["lvel"][i]
        out[base + pfw._AVEL + i] = d["avel"][i]
    for i in range(4):
        out[base + pfw._QUAT + i] = d["quat"][i]
    for i in range(12):
        out[base + pfw._VIEW + i] = d["view"][i]
    for i in range(15):
        out[base + pfw._SLV + i] = d["slv"][i]
    for i in range(5):
        out[base + pfw._ACT + i] = d["act"][i]
    out[base + pfw._THR] = d["thr"]
    for i in range(6):
        out[base + pfw._SP + i] = d["sp"][i]
    out[base + pfw._CON] = d["contact"]


def _build_kernel(
    params: fixedwing.FixedwingParams,
    cfg: fixedwing.FixedwingConfig,
    noisy: bool,
    fuse: dict,
):
    """Bakes the arena step. ``fuse`` keys: ``inner_steps`` (env_step_ratio),
    ``dome``, ``max_steps``, ``lethal_angle``, ``lethal_distance``,
    ``damage_per_hit``, ``collision_radius``, ``sparse``."""
    B = pfw._bake(params, cfg)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    inner = int(fuse["inner_steps"])
    dome2 = float(fuse["dome"]) ** 2
    max_steps = float(fuse["max_steps"])
    lethal_a = float(fuse["lethal_angle"])
    lethal_d = float(fuse["lethal_distance"])
    dph = float(fuse["damage_per_hit"])
    crad2 = (2.0 * float(fuse["collision_radius"])) ** 2
    sparse = bool(fuse["sparse"])

    def kernel(seed_ref, s_ref, o_ref):
        if noisy:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        S = s_ref[:]  # (ROWS, 8, TILE)

        d0 = _bank_read(S, _D0)
        d1 = _bank_read(S, _D1)
        hp = [S[_HP], S[_HP + 1]]
        ang = [S[_ANG], S[_ANG + 1]]
        pang = [S[_PANG], S[_PANG + 1]]
        hit = [S[_HIT], S[_HIT + 1]]
        dist = S[_DIST]
        pdist = S[_PDIST]
        othd = S[_OTHD]
        stepc = S[_STEPC]
        zero = jnp.zeros_like(dist)
        term = [zero, zero]
        trunc = [zero, zero]
        rwd = [zero, zero]
        collf = [zero, zero]
        oobf = [zero, zero]
        # step_count is pre-increment and constant across the inner loop
        # (ma_fixedwing_dogfight.py:332 uses st.step_count > max_steps)
        trunc_hit = (stepc > max_steps).astype(jnp.float32)

        # setpoints are written once per agent step, so the mode-0 assist
        # command is constant across the inner loop (aviary set_mode(0)
        # quirk: even 6-dim unassisted actions use this map — see
        # envs/ma_fixedwing_dogfight.py action_size docstring)
        cmd0 = pfw._control_cmd(B, 0, d0["sp"])
        cmd1 = pfw._control_cmd(B, 0, d1["sp"])

        for _a in range(inner):
            # ---- engagement rewards FIRST, from the PREVIOUS aviary step's
            # memos (ma_fixedwing_dogfight_env.py:306-313 fires the reward
            # memo before the state memo)
            r_step = [zero, zero]
            if not sparse:
                in_range = (dist < lethal_d).astype(jnp.float32)
                closing = jnp.maximum(pdist - dist, 0.0)
                for i in range(2):
                    chasing = (jnp.abs(ang[i]) < (np.pi / 2.0)).astype(
                        jnp.float32
                    )
                    r_step[i] = (
                        closing * (1.0 - in_range) * chasing
                        + (pang[i] - ang[i]) * in_range * 10.0
                        + 3.0 / (ang[i] + 0.1) * in_range
                    )
            r_step[0] = r_step[0] + 30.0 * hit[0] - 20.0 * hit[1]
            r_step[1] = r_step[1] + 30.0 * hit[1] - 20.0 * hit[0]

            # ---- physics: one aviary step per drone bank
            c = [zero, zero]
            for _it in range(B["ratio"]):
                pfw._drone_physics_iter(B, noisy, d0, cmd0)
                pfw._drone_physics_iter(B, noisy, d1, cmd1)
                c[0] = jnp.maximum(c[0], d0["contact"])
                c[1] = jnp.maximum(c[1], d1["contact"])

            # ---- _agent_states (ma_fixedwing_dogfight_env.py:164-207):
            # forward vectors from the lagged euler read, gun positions,
            # separation, cone angles, hits, health
            fwd = []
            gun = []
            for d in (d0, d1):
                v = d["view"]
                cp = jnp.cos(v[4])
                f_i = [jnp.cos(v[5]) * cp, jnp.sin(v[5]) * cp, -jnp.sin(v[4])]
                fwd.append(f_i)
                gun.append([v[9 + k] - 0.35 * f_i[k] for k in range(3)])
            sep = [gun[1][k] - gun[0][k] for k in range(3)]  # d0 -> d1
            d2 = sep[0] * sep[0] + sep[1] * sep[1] + sep[2] * sep[2]
            dist_new = jnp.sqrt(d2)
            inv_d = 1.0 / jnp.maximum(dist_new, 1e-8)
            dots = [
                (sep[0] * fwd[0][0] + sep[1] * fwd[0][1] + sep[2] * fwd[0][2]),
                -(sep[0] * fwd[1][0] + sep[1] * fwd[1][1] + sep[2] * fwd[1][2]),
            ]
            ang_new = [
                (np.pi / 2.0) - pmk.asin(jnp.clip(dots[i] * inv_d, -1.0, 1.0))
                for i in range(2)
            ]
            in_range_new = (dist_new < lethal_d).astype(jnp.float32)
            hit_new = [
                (ang_new[i] < lethal_a).astype(jnp.float32)
                * in_range_new
                * (jnp.abs(ang_new[i]) < (np.pi / 2.0)).astype(jnp.float32)
                for i in range(2)
            ]
            hp = [hp[0] - dph * hit_new[1], hp[1] - dph * hit_new[0]]
            pang, ang = ang, ang_new
            pdist, dist = dist, dist_new
            hit = hit_new

            # ---- collisions / bounds (ma_fixedwing_dogfight.py:320-331)
            dx = d0["pos"][0] - d1["pos"][0]
            dy = d0["pos"][1] - d1["pos"][1]
            dz = d0["pos"][2] - d1["pos"][2]
            mutual = (dx * dx + dy * dy + dz * dz < crad2).astype(jnp.float32)
            for i, d in enumerate((d0, d1)):
                coll_i = jnp.maximum(c[i], mutual)
                v = d["view"]
                lp2 = v[9] * v[9] + v[10] * v[10] + v[11] * v[11]
                oob_i = (lp2 > dome2).astype(jnp.float32)
                r_step[i] = r_step[i] - 3000.0 * oob_i - 3000.0 * coll_i
                term[i] = jnp.minimum(term[i] + coll_i + oob_i + othd, 1.0)
                trunc[i] = jnp.minimum(trunc[i] + trunc_hit, 1.0)
                rwd[i] = rwd[i] + r_step[i]
                collf[i] = jnp.minimum(collf[i] + coll_i, 1.0)
                oobf[i] = jnp.minimum(oobf[i] + oob_i, 1.0)

        # ---- pack back
        out = [None] * ROWS
        _bank_write(out, _D0, d0)
        _bank_write(out, _D1, d1)
        out[_HP], out[_HP + 1] = hp
        out[_ANG], out[_ANG + 1] = ang
        out[_PANG], out[_PANG + 1] = pang
        out[_HIT], out[_HIT + 1] = hit
        out[_DIST] = dist
        out[_PDIST] = pdist
        out[_TERM], out[_TERM + 1] = term
        out[_TRUNC], out[_TRUNC + 1] = trunc
        out[_RWD], out[_RWD + 1] = rwd
        out[_COLLF], out[_COLLF + 1] = collf
        out[_OOBF], out[_OOBF + 1] = oobf
        out[_OTHD] = othd
        out[_STEPC] = stepc + 1.0
        for i in range(ROWS):  # padding rows
            if out[i] is None:
                out[i] = zero
        o_ref[:] = jnp.stack(out, axis=0)

    return kernel


def packed_dogfight_step(
    packed: Array,
    seed: Array,
    params: fixedwing.FixedwingParams,
    cfg: fixedwing.FixedwingConfig,
    noisy: bool,
    inner_steps: int,
    dome: float,
    max_steps: int,
    lethal_angle: float,
    lethal_distance: float,
    damage_per_hit: float,
    collision_radius: float,
    sparse: bool = False,
    tile: int = 256,
) -> Array:
    """One FULL dogfight agent step on the packed (ROWS, 8, N/8) arena state
    (N arenas = 2N agents). ``params`` must be CONCRETE; wrap the caller in
    ``jax.jit``. See envs/packed_dogfight.py for the env wrapper."""
    kernel = _build_kernel(
        params, cfg, noisy,
        fuse=dict(
            inner_steps=inner_steps, dome=dome, max_steps=max_steps,
            lethal_angle=lethal_angle, lethal_distance=lethal_distance,
            damage_per_hit=damage_per_hit, collision_radius=collision_radius,
            sparse=sparse,
        ),
    )
    return pmk.grid_call(kernel, packed, seed, tile)
