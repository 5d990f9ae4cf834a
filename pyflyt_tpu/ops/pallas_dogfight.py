"""Pallas TPU kernel: fused 2-agent Fixedwing dogfight agent step.

Layout (round 3, the perf pass VERDICT r2 item 5 asked for): one DRONE per
lane element — 2N drones of N arenas fold to ``(ROWS, 8, 2N/8)`` with drone
0 of every arena in sublanes 0-3 and its opponent in sublanes 4-7, so the
partner's registers are exactly a sublane roll by 4 away. The previous
arena-per-element layout stacked BOTH 53-row drone banks in one lane
(live-register set ~2x the single-drone fixedwing kernel's, ~21 zero pad
rows out of 128), and measured only 2.2x its XLA path (8.2M agent-steps/s,
v5e) while the single-bank fixedwing kernel held 6.8x — i.e. it was bound
by register pressure, not arithmetic. This layout runs ONE bank over all
2N drones (the engagement math is symmetric per drone once partner values
are rolled in: own angle = f(partner_gun - own_gun, own_fwd) for both
sides) at the fixedwing kernel's live set plus 13 memo rows; the only
cross-drone traffic is 8 sublane rolls per aviary step (partner gun x3,
pos x3, hit, and the arena-shared values are stored per drone).

One kernel call still runs the WHOLE dogfight agent step (``inner_steps``
aviary steps x ``physics_control_ratio`` physics iterations, engagement
rewards with the reference's one-step memo lag, termination/truncation
accumulation).

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
D_ROWS = 53  # the drone bank: pfw rows _POS.._CON (52) inclusive

# ---- per-drone engagement/episode rows (partner-shared values duplicated)
_HP = D_ROWS      # own health
_ANG = _HP + 1    # own current_angles memo
_PANG = _ANG + 1  # own prev_angles memo (one aviary step older)
_HIT = _PANG + 1  # own current_hits memo (0/1)
_DIST = _HIT + 1  # arena distance memo (same value in both drones)
_PDIST = _DIST + 1
_TERM = _PDIST + 1
_TRUNC = _TERM + 1
_RWD = _TRUNC + 1   # reward accumulated over the agent step
_COLLF = _RWD + 1   # any-collision info flag (this step)
_OOBF = _COLLF + 1  # any-out-of-bounds info flag (this step)
_OTHD = _OOBF + 1   # other-dead flag (wrapper-computed at step start)
_STEPC = _OTHD + 1  # agent step count (pre-increment)

ROWS = 72  # 66 used, padded to a multiple of 8 sublanes
assert _STEPC + 1 <= ROWS


def _partner(x: Array) -> Array:
    """The opponent's value of a (8, TILE) register: drone m of arena a sits
    4 sublanes away from drone 1-m (the wrapper packs [all drone-0s, all
    drone-1s] row-major into the sublane axis), so a sublane roll by 4 is an
    exact, self-inverse partner exchange."""
    return jnp.roll(x, 4, axis=0)


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

        d = {
            "pos": [S[pfw._POS + i] for i in range(3)],
            "quat": [S[pfw._QUAT + i] for i in range(4)],
            "lvel": [S[pfw._LVEL + i] for i in range(3)],
            "avel": [S[pfw._AVEL + i] for i in range(3)],
            "view": [S[pfw._VIEW + i] for i in range(12)],
            "slv": [S[pfw._SLV + i] for i in range(15)],
            "act": [S[pfw._ACT + i] for i in range(5)],
            "thr": S[pfw._THR],
            "sp": [S[pfw._SP + i] for i in range(6)],
            "contact": S[pfw._CON],
        }
        hp = S[_HP]
        ang = S[_ANG]
        pang = S[_PANG]
        hit = S[_HIT]
        dist = S[_DIST]
        pdist = S[_PDIST]
        othd = S[_OTHD]
        stepc = S[_STEPC]
        zero = jnp.zeros_like(dist)
        term = zero
        trunc = zero
        rwd = zero
        collf = zero
        oobf = zero
        # step_count is pre-increment and constant across the inner loop
        # (ma_fixedwing_dogfight.py:332 uses st.step_count > max_steps)
        trunc_hit = (stepc > max_steps).astype(jnp.float32)

        # setpoints are written once per agent step, so the mode-0 assist
        # command is constant across the inner loop (aviary set_mode(0)
        # quirk: even 6-dim unassisted actions use this map — see
        # envs/ma_fixedwing_dogfight.py action_size docstring)
        cmd = pfw._control_cmd(B, 0, d["sp"])

        for _a in range(inner):
            # ---- engagement rewards FIRST, from the PREVIOUS aviary step's
            # memos (ma_fixedwing_dogfight_env.py:306-313 fires the reward
            # memo before the state memo). Per-drone symmetric: own angle
            # memos + the partner's hit memo.
            if sparse:
                r_step = zero
            else:
                in_range = (dist < lethal_d).astype(jnp.float32)
                closing = jnp.maximum(pdist - dist, 0.0)
                chasing = (jnp.abs(ang) < (np.pi / 2.0)).astype(jnp.float32)
                r_step = (
                    closing * (1.0 - in_range) * chasing
                    + (pang - ang) * in_range * 10.0
                    + 3.0 / (ang + 0.1) * in_range
                )
            r_step = r_step + 30.0 * hit - 20.0 * _partner(hit)

            # ---- physics: one aviary step, ONE bank covering all 2N drones
            c = zero
            for _it in range(B["ratio"]):
                pfw._drone_physics_iter(B, noisy, d, cmd)
                c = jnp.maximum(c, d["contact"])

            # ---- _agent_states (ma_fixedwing_dogfight_env.py:164-207):
            # forward vector from the lagged euler read, own gun position,
            # separation toward the partner (sign-symmetric: |sep| and
            # own-forward dot are what the cone math consumes)
            v = d["view"]
            cp = jnp.cos(v[4])
            fwd = [jnp.cos(v[5]) * cp, jnp.sin(v[5]) * cp, -jnp.sin(v[4])]
            gun = [v[9 + k] - 0.35 * fwd[k] for k in range(3)]
            sep = [_partner(gun[k]) - gun[k] for k in range(3)]
            d2 = sep[0] * sep[0] + sep[1] * sep[1] + sep[2] * sep[2]
            dist_new = jnp.sqrt(d2)
            inv_d = 1.0 / jnp.maximum(dist_new, 1e-8)
            dot = sep[0] * fwd[0] + sep[1] * fwd[1] + sep[2] * fwd[2]
            ang_new = (np.pi / 2.0) - pmk.asin(
                jnp.clip(dot * inv_d, -1.0, 1.0)
            )
            in_range_new = (dist_new < lethal_d).astype(jnp.float32)
            hit_new = (
                (ang_new < lethal_a).astype(jnp.float32)
                * in_range_new
                * (jnp.abs(ang_new) < (np.pi / 2.0)).astype(jnp.float32)
            )
            hp = hp - dph * _partner(hit_new)
            pang, ang = ang, ang_new
            pdist, dist = dist, dist_new
            hit = hit_new

            # ---- collisions / bounds (ma_fixedwing_dogfight.py:320-331)
            dx = d["pos"][0] - _partner(d["pos"][0])
            dy = d["pos"][1] - _partner(d["pos"][1])
            dz = d["pos"][2] - _partner(d["pos"][2])
            mutual = (dx * dx + dy * dy + dz * dz < crad2).astype(jnp.float32)
            coll = jnp.maximum(c, mutual)
            lp2 = v[9] * v[9] + v[10] * v[10] + v[11] * v[11]
            oob = (lp2 > dome2).astype(jnp.float32)
            r_step = r_step - 3000.0 * oob - 3000.0 * coll
            term = jnp.minimum(term + coll + oob + othd, 1.0)
            trunc = jnp.minimum(trunc + trunc_hit, 1.0)
            rwd = rwd + r_step
            collf = jnp.minimum(collf + coll, 1.0)
            oobf = jnp.minimum(oobf + oob, 1.0)

        # ---- pack back
        out = [None] * ROWS
        for i in range(3):
            out[pfw._POS + i] = d["pos"][i]
            out[pfw._LVEL + i] = d["lvel"][i]
            out[pfw._AVEL + i] = d["avel"][i]
        for i in range(4):
            out[pfw._QUAT + i] = d["quat"][i]
        for i in range(12):
            out[pfw._VIEW + i] = d["view"][i]
        for i in range(15):
            out[pfw._SLV + i] = d["slv"][i]
        for i in range(5):
            out[pfw._ACT + i] = d["act"][i]
        out[pfw._THR] = d["thr"]
        for i in range(6):
            out[pfw._SP + i] = d["sp"][i]
        out[pfw._CON] = d["contact"]
        out[_HP] = hp
        out[_ANG] = ang
        out[_PANG] = pang
        out[_HIT] = hit
        out[_DIST] = dist
        out[_PDIST] = pdist
        out[_TERM] = term
        out[_TRUNC] = trunc
        out[_RWD] = rwd
        out[_COLLF] = collf
        out[_OOBF] = oobf
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
    tile: int = 512,
) -> Array:
    """One FULL dogfight agent step on the packed (ROWS, 8, 2N/8) drone state
    (N arenas = 2N agents; drone 0s in sublanes 0-3, drone 1s in 4-7).
    ``params`` must be CONCRETE; wrap the caller in ``jax.jit``. See
    envs/packed_dogfight.py for the env wrapper."""
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
