"""Fused-kernel MA Fixedwing Dogfight: arenas on lanes, drones on row banks.

Fast-path wrapper around ``ops/pallas_dogfight.py``: ``N`` arenas (2N agents)
live in a folded ``(128, 8, N/8)`` state — drone 0 in rows 0-52, drone 1 in
rows 53-105 (the ops/pallas_fixedwing.py bank layout), engagement memos and
episode flags in rows 106-127. ``step`` runs the WHOLE dogfight agent step
(4 aviary steps x 2 physics iterations x 2 drones + engagement rewards with
the reference's memo lag + termination bookkeeping) in ONE ``pallas_call``;
the 30-dim observation pair is assembled here in XLA from the final packed
state (ma_fixedwing_dogfight_env.py:209-248 — the reference recomputes it
every aviary step but only the last one is ever observed).

Semantics match ``MAFixedwingDogfightEnv`` exactly with noise off (asserted
in tests/test_pallas_dogfight.py); with noise on the booster-noise PRNG
stream differs (kernel-internal PRNG), same distribution.

Reference: /root/reference/PyFlyt/pz_envs/fixedwing_envs/
ma_fixedwing_dogfight_env.py (see envs/ma_fixedwing_dogfight.py for the
line-by-line citations this fast path inherits).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from pyflyt_tpu.envs.ma_fixedwing_dogfight import (
    DogfightState,
    MAFixedwingDogfightEnv,
    compute_rotation_forward,
)
from pyflyt_tpu.envs.ma_quadx_hover import MAStepOut
from pyflyt_tpu.ops import pallas_dogfight as pdg
from pyflyt_tpu.ops import pallas_fixedwing as pfw


@struct.dataclass
class PackedDogfightEnvState:
    packed: Array  # (pdg.ROWS, 8, N/8)
    key: Array
    alive: Array  # (N, 2) bool
    current_actions: Array  # (N, 2, A)
    past_actions: Array  # (N, 2, A)


@dataclasses.dataclass(frozen=True)
class PackedMAFixedwingDogfightEnv:
    """Drop-in fused fast path for ``MAFixedwingDogfightEnv`` batched over
    ``N`` arenas (N % 8 == 0)."""

    base: MAFixedwingDogfightEnv = dataclasses.field(
        default_factory=MAFixedwingDogfightEnv
    )

    @property
    def num_agents(self) -> int:
        return 2

    # ----- layout conversions ---------------------------------------------
    def pack_env_state(self, st: DogfightState) -> Array:
        """Batched (N,) DogfightState -> packed (ROWS, 8, N/8) array."""
        n = st.health.shape[0]
        banks = []
        for m in range(2):
            drone_m = jax.tree.map(lambda x: x[:, m], st.drones)
            banks.append(
                pfw.pack_state(drone_m).reshape(pfw.ROWS, n)[: pdg.D_ROWS]
            )
        f32 = banks[0].dtype
        env_rows = jnp.stack(
            [
                st.health[:, 0], st.health[:, 1],
                st.current_angles[:, 0], st.current_angles[:, 1],
                st.prev_angles[:, 0], st.prev_angles[:, 1],
                st.current_hits[:, 0].astype(f32),
                st.current_hits[:, 1].astype(f32),
                st.current_distance, st.prev_distance,
                jnp.zeros((n,), f32), jnp.zeros((n,), f32),  # term
                jnp.zeros((n,), f32), jnp.zeros((n,), f32),  # trunc
                jnp.zeros((n,), f32), jnp.zeros((n,), f32),  # reward
                jnp.zeros((n,), f32), jnp.zeros((n,), f32),  # collf
                jnp.zeros((n,), f32), jnp.zeros((n,), f32),  # oobf
                jnp.zeros((n,), f32),                        # other_dead
                st.step_count.astype(f32),
            ],
            axis=0,
        )
        pad = pdg.ROWS - 2 * pdg.D_ROWS - env_rows.shape[0]
        packed = jnp.concatenate(
            [*banks, env_rows, jnp.zeros((pad, n), f32)], axis=0
        )
        return packed.reshape(pdg.ROWS, pdg.SUBLANES, n // pdg.SUBLANES)

    # ----- observation assembly (ma_fixedwing_dogfight_env.py:164-248) -----
    def _obs(self, flat: Array, past_actions: Array) -> Array:
        """(ROWS, N) flat rows -> (N, 2, 30) observation pair, identical math
        to MAFixedwingDogfightEnv._agent_states on the final aviary step."""
        n = flat.shape[1]
        view = jnp.stack(
            [
                flat[pdg._D0 + pfw._VIEW : pdg._D0 + pfw._VIEW + 12].T,
                flat[pdg._D1 + pfw._VIEW : pdg._D1 + pfw._VIEW + 12].T,
            ],
            axis=1,
        ).reshape(n, 2, 4, 3)
        health = jnp.stack([flat[pdg._HP], flat[pdg._HP + 1]], axis=1)
        rotation, forward = compute_rotation_forward(view[:, :, 1])
        gun_pos = view[:, :, 3] - forward * 0.35
        attitudes = view.at[:, :, 3].set(gun_pos)
        separation = gun_pos[:, ::-1] - gun_pos
        opp_ang_vel = attitudes[:, ::-1, 0]
        opp_ang_pos = attitudes[:, ::-1, 1] - attitudes[:, :, 1]
        ground_vel = jnp.einsum("nmij,nmj->nmi", rotation, attitudes[:, :, 2])
        opp_vel_in_self = jnp.einsum(
            "nmj,nmji->nmi", ground_vel[:, ::-1], rotation
        )
        opp_lin_vel = opp_vel_in_self - attitudes[:, :, 2]
        opp_lin_pos = jnp.einsum("nmj,nmji->nmi", separation, rotation)
        opponent = jnp.stack(
            [opp_ang_vel, opp_ang_pos, opp_lin_vel, opp_lin_pos], axis=2
        )
        return jnp.concatenate(
            [
                attitudes.reshape(n, 2, 12),
                health[..., None],
                opponent.reshape(n, 2, 12),
                health[:, ::-1][..., None],
                past_actions,
            ],
            axis=-1,
        )

    # ----- API --------------------------------------------------------------
    def reset(self, keys: Array) -> tuple[PackedDogfightEnvState, Array]:
        """``keys``: (N, 2) PRNG keys, N % 8 == 0."""
        b = self.base
        n = keys.shape[0]
        assert n % pdg.SUBLANES == 0, n
        st, obs = jax.vmap(b.reset)(keys)
        packed = self.pack_env_state(st)
        state = PackedDogfightEnvState(
            packed=packed,
            key=st.key[0],
            alive=st.alive,
            current_actions=st.current_actions,
            past_actions=st.past_actions,
        )
        return state, obs

    def step(
        self, state: PackedDogfightEnvState, actions: Array
    ) -> tuple[PackedDogfightEnvState, MAStepOut]:
        """``actions``: (N, 2, action_size). One full agent step per arena."""
        b = self.base
        key, sub = jax.random.split(state.key)
        seed = jax.random.randint(sub, (), 0, 2**31 - 1)
        flat = state.packed.reshape(pdg.ROWS, -1)
        f32 = flat.dtype
        n = flat.shape[1]

        agents_mask = state.alive
        actions = jnp.asarray(actions, dtype=f32)
        actions = jnp.where(agents_mask[..., None], actions, 0.0)
        # setpoint rows (padded to the 6-row bank slot) + other-dead flag
        for m, base in enumerate((pdg._D0, pdg._D1)):
            sp = actions[:, m]
            a_dim = sp.shape[-1]
            flat = flat.at[base + pfw._SP : base + pfw._SP + a_dim].set(sp.T)
            if a_dim < 6:
                flat = flat.at[
                    base + pfw._SP + a_dim : base + pfw._SP + 6
                ].set(0.0)
        other_dead = (jnp.sum(agents_mask, axis=1) < 2).astype(f32)
        flat = flat.at[pdg._OTHD].set(other_dead)

        out = pdg.packed_dogfight_step(
            flat.reshape(pdg.ROWS, pdg.SUBLANES, -1),
            seed,
            b.params,
            b.cfg,
            noisy=b.cfg.noisy_motors,
            inner_steps=b.env_step_ratio,
            dome=b.flight_dome_size,
            max_steps=b.max_steps,
            lethal_angle=b.lethal_angle_radians,
            lethal_distance=b.lethal_distance,
            damage_per_hit=b.damage_per_hit,
            collision_radius=b.collision_radius,
            sparse=b.sparse_reward,
        )
        oflat = out.reshape(pdg.ROWS, -1)
        term = jnp.stack(
            [oflat[pdg._TERM] > 0.5, oflat[pdg._TERM + 1] > 0.5], axis=1
        )
        trunc = jnp.stack(
            [oflat[pdg._TRUNC] > 0.5, oflat[pdg._TRUNC + 1] > 0.5], axis=1
        )
        reward = jnp.stack([oflat[pdg._RWD], oflat[pdg._RWD + 1]], axis=1)
        health = jnp.stack([oflat[pdg._HP], oflat[pdg._HP + 1]], axis=1)
        # the obs's past-action block is the action of the PREVIOUS step:
        # the reference rolls past <- current at step entry and _agent_states
        # reads past_actions (ma_fixedwing_dogfight_env.py:240-248)
        obs = self._obs(oflat, state.current_actions)
        new_state = PackedDogfightEnvState(
            packed=out,
            key=key,
            alive=state.alive & ~(term | trunc),
            current_actions=actions,
            past_actions=state.current_actions,
        )
        step_out = MAStepOut(
            obs=obs,
            reward=reward,
            termination=term,
            truncation=trunc,
            agents_mask=agents_mask,
            info={
                "collision": jnp.stack(
                    [oflat[pdg._COLLF] > 0.5, oflat[pdg._COLLF + 1] > 0.5],
                    axis=1,
                ),
                "out_of_bounds": jnp.stack(
                    [oflat[pdg._OOBF] > 0.5, oflat[pdg._OOBF + 1] > 0.5],
                    axis=1,
                ),
                "wins": jnp.broadcast_to(
                    (health <= 0.0)[:, None, :], health.shape[:1] + (2, 2)
                ),
                "healths": jnp.broadcast_to(
                    health[:, None, :], health.shape[:1] + (2, 2)
                ),
            },
        )
        return new_state, step_out
