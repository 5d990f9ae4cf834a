"""Quaternion / Euler / rotation math for the flight-dynamics core.

Conventions (chosen to match the PyBullet readout semantics the reference
relies on — see /root/reference/PyFlyt/core/drones/quadx.py:589-612):

- Quaternions are stored ``(x, y, z, w)`` (PyBullet order) and represent the
  rotation taking body-frame vectors to world-frame vectors.
- Euler angles are ``(roll, pitch, yaw)`` about the fixed world axes X, Y, Z
  applied in that order, i.e. ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)`` — the
  convention of PyBullet's ``getQuaternionFromEuler``.
- ``quat_to_rotmat(q)`` returns the body→world matrix ``R``; the reference's
  ``getMatrixFromQuaternion(q).reshape(3,3).T`` is then ``R.T`` (world→body).

All functions are shape-polymorphic over leading batch dimensions: inputs of
shape ``(..., 4)`` / ``(..., 3)`` produce outputs with the same leading dims,
so they can be used directly inside ``vmap``-free batched code.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def safe_norm(v: Array, axis: int = -1, keepdims: bool = False) -> Array:
    """``jnp.linalg.norm`` with a NaN-free gradient at ``v = 0``.

    ``d‖v‖/dv = v/‖v‖`` is 0/0 at the origin, and a downstream ``where``/
    ``maximum`` does NOT block the NaN cotangent (it multiplies it by zero).
    The double-``where`` idiom keeps the forward value identical
    (``‖v‖``, exactly 0 at the origin) while the sqrt branch never sees 0.
    Needed wherever the differentiable sim takes norms of quantities that
    are exactly zero at rest (contact tangential velocity, freestream speed).
    """
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    nonzero = sq > 0.0
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, sq, 1.0)), 0.0)


def normalize(v: Array, eps: float = 1e-12) -> Array:
    """Normalizes the last axis of ``v`` to unit length (grad-safe at 0)."""
    return v / jnp.maximum(safe_norm(v, keepdims=True), eps)


# ---------------------------------------------------------------------------
# quaternion algebra (xyzw)
# ---------------------------------------------------------------------------


def quat_identity(batch_shape: tuple[int, ...] = (), dtype=jnp.float32) -> Array:
    """Returns identity quaternion(s) of shape ``(*batch_shape, 4)``."""
    q = jnp.zeros((*batch_shape, 4), dtype=dtype)
    return q.at[..., 3].set(1.0)


def quat_mul(q1: Array, q2: Array) -> Array:
    """Hamilton product ``q1 ⊗ q2`` in xyzw order.

    Composition rule: rotating by ``q2`` then ``q1`` equals rotating by
    ``quat_mul(q1, q2)``.
    """
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: Array) -> Array:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotates vector(s) ``v`` by quaternion(s) ``q`` (body → world).

    Uses the expanded Rodrigues form (no intermediate quaternion products):
    ``v' = v + 2 w (u × v) + 2 (u × (u × v))`` with ``u = q.xyz``.
    """
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: Array, v: Array) -> Array:
    """Rotates ``v`` by the inverse of ``q`` (world → body)."""
    return quat_rotate(quat_conj(q), v)


def quat_to_rotmat(q: Array) -> Array:
    """Body→world rotation matrix of shape ``(..., 3, 3)``."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz),
            2.0 * (xy - wz),
            2.0 * (xz + wy),
            2.0 * (xy + wz),
            1.0 - 2.0 * (xx + zz),
            2.0 * (yz - wx),
            2.0 * (xz - wy),
            2.0 * (yz + wx),
            1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(*q.shape[:-1], 3, 3)


# ---------------------------------------------------------------------------
# euler <-> quaternion (PyBullet fixed-axis XYZ / intrinsic ZYX convention)
# ---------------------------------------------------------------------------


def euler_to_quat(rpy: Array) -> Array:
    """Roll-pitch-yaw (fixed world XYZ axes) → quaternion (xyzw)."""
    half = rpy * 0.5
    cr, cp, cy = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sr, sp, sy = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def quat_to_euler(q: Array) -> Array:
    """Quaternion (xyzw) → roll-pitch-yaw, matching PyBullet's extraction."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)

    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_to_rotmat(rpy: Array) -> Array:
    """Roll-pitch-yaw → body→world rotation matrix."""
    return quat_to_rotmat(euler_to_quat(rpy))


# ---------------------------------------------------------------------------
# integration
# ---------------------------------------------------------------------------


def quat_integrate(q: Array, omega_world: Array, dt: float | Array) -> Array:
    """Integrates orientation under world-frame angular velocity for ``dt``.

    Uses the exact exponential map ``q' = exp(ω dt / 2) ⊗ q`` (world-frame
    rate composes on the left), with a Taylor fallback near ‖ω‖ = 0 so the
    function stays differentiable and NaN-free under jit.
    """
    theta = omega_world * dt
    sq = jnp.sum(theta * theta, axis=-1, keepdims=True)
    small = sq < 1e-16
    # double-where so the sqrt/divide branch never sees 0 (keeps grads NaN-free)
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))
    half = 0.5 * angle
    # sin(half)/angle, with series expansion 0.5 - angle^2/48 for tiny angles
    sinc_half = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    cos_half = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    dq = jnp.concatenate([theta * sinc_half, cos_half], axis=-1)
    return normalize(quat_mul(dq, q))


def wrap_angle(a: Array) -> Array:
    """Wraps angle(s) into ``[-pi, pi)``."""
    return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi


# ---------------------------------------------------------------------------
# orientation-convention remaps (fork feature: NED_FRD support)
# ---------------------------------------------------------------------------
# The reference stores the simulation in ENU/FLU (PyBullet's native frame) and
# remaps readouts/spawns for NED_FRD (quadx.py:598-612, base_drone.py:114-124).
# We mirror that: the integrator always runs ENU; these helpers remap.


def enu_pos_to_ned(pos: Array) -> Array:
    """ENU position → NED position: (x,y,z) → (y,x,-z)."""
    return jnp.stack([pos[..., 1], pos[..., 0], -pos[..., 2]], axis=-1)


def ned_pos_to_enu(pos: Array) -> Array:
    """NED position → ENU position (self-inverse)."""
    return enu_pos_to_ned(pos)


def flu_vec_to_frd(v: Array) -> Array:
    """Body FLU vector → body FRD vector: (x,y,z) → (x,-y,-z)."""
    return v * jnp.asarray([1.0, -1.0, -1.0], dtype=v.dtype)


def enu_euler_to_ned(rpy: Array) -> Array:
    """ENU/FLU euler → NED/FRD euler: (r,p,y) → (r, -p, pi/2 - y)."""
    return jnp.stack(
        [rpy[..., 0], -rpy[..., 1], (jnp.pi / 2) - rpy[..., 2]], axis=-1
    )


def ned_euler_to_enu(rpy: Array) -> Array:
    """NED/FRD euler → ENU/FLU euler (self-inverse)."""
    return enu_euler_to_ned(rpy)
