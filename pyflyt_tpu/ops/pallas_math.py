"""Shared scalar-math helpers for the Mosaic/Pallas TPU kernels.

Mosaic has no atan2/arcsin lowering, so the kernels use f32-grade minimax
polynomials (|err| < 2e-5 rad — these only feed euler observations and the
aero angle-of-attack, both far above that noise floor). The quaternion
helpers mirror pyflyt_tpu/core/math.py on unpacked scalar "register" values
(each a (8, TILE) tile) instead of stacked (..., 4) arrays.

Everything here is plain jnp and traces identically under
``pallas_call(interpret=True)`` on CPU and real Mosaic lowering on TPU.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

# process-wide interpret-mode override for every kernel launched through
# grid_call (the single pallas_call site in the package). Scoped via
# force_interpret() so off-TPU callers (the driver's CPU dryrun) don't have
# to monkeypatch jax.experimental.pallas.pallas_call globally.
_FORCE_INTERPRET = False


@contextlib.contextmanager
def force_interpret():
    """Runs every grid_call-launched kernel in Pallas interpret mode."""
    global _FORCE_INTERPRET
    prev = _FORCE_INTERPRET
    _FORCE_INTERPRET = True
    try:
        yield
    finally:
        _FORCE_INTERPRET = prev


def atan_unit(t):
    """Minimax atan on |t| <= 1."""
    t2 = t * t
    return t * (
        0.99997726
        + t2
        * (
            -0.33262347
            + t2
            * (
                0.19354346
                + t2 * (-0.11643287 + t2 * (0.05265332 + t2 * -0.01172120))
            )
        )
    )


def atan(t):
    at = jnp.abs(t)
    inv = at > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(at, 1e-30), at)
    r = atan_unit(z)
    r = jnp.where(inv, (np.pi / 2) - r, r)
    return jnp.where(t < 0.0, -r, r)


def atan2(yv, xv):
    safe_x = jnp.where(
        jnp.abs(xv) < 1e-30, jnp.where(xv >= 0.0, 1e-30, -1e-30), xv
    )
    base = atan(yv / safe_x)
    add = jnp.where(yv >= 0.0, np.pi, -np.pi)
    return jnp.where(xv < 0.0, base + add, base)


def asin(s):
    s = jnp.clip(s, -1.0, 1.0)
    return atan2(s, jnp.sqrt(jnp.maximum(1.0 - s * s, 1e-12)))


def quat_rotmat(quat):
    """[x, y, z, w] registers -> 9 rotation-matrix entries (body->world),
    row-major (r00, r01, r02, r10, ..., r22)."""
    x, y, z, w = quat
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )


def quat_to_euler(quat):
    """[x, y, z, w] -> (roll, pitch, yaw), PyBullet extraction
    (core/math.py::quat_to_euler)."""
    x, y, z, w = quat
    roll = atan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = asin(2 * (w * y - z * x))
    yaw = atan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def quat_integrate(quat, avel, dt):
    """Exact exponential-map quaternion step under world angular velocity
    (core/math.py::quat_integrate) on register values."""
    x, y, z, w = quat
    thx, thy, thz = avel[0] * dt, avel[1] * dt, avel[2] * dt
    sq = thx * thx + thy * thy + thz * thz
    small = sq < 1e-16
    ang = jnp.sqrt(jnp.where(small, 1.0, sq))
    half = 0.5 * ang
    sinc = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / ang)
    ch = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    dx, dy, dz, dw = thx * sinc, thy * sinc, thz * sinc, ch
    nx = dw * x + dx * w + dy * z - dz * y
    ny = dw * y - dx * z + dy * w + dz * x
    nz = dw * z + dx * y - dy * x + dz * w
    nw = dw * w - dx * x - dy * y - dz * z
    norm = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + nw * nw)
    return [nx * norm, ny * norm, nz * norm, nw * norm]


def make_normal(shape):
    """Standard-normal draw via Box-Muller from the per-core Pallas PRNG
    (two 31-bit draws; Mosaic lacks a uint32->f32 cast). Call
    ``pltpu.prng_seed`` first."""
    from jax.experimental.pallas import tpu as pltpu

    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    u1 = (b1 & 0x7FFFFFFF).astype(jnp.float32) / 2147483648.0
    u2 = (b2 & 0x7FFFFFFF).astype(jnp.float32) / 2147483648.0
    u1 = jnp.clip(u1, 1e-7, 1.0)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)


# ---------------------------------------------------------------------------
# constant-vector algebra with trace-time zero skipping
# ---------------------------------------------------------------------------
# Kernel parameters (unit vectors, lever arms) are concrete at bake time and
# usually sparse (axis-aligned units, in-plane offsets). These helpers expand
# dot/cross/axpy against a concrete numpy 3-vector, skipping exact-zero terms
# so Mosaic never sees multiply-by-zero chains.


def dot_const(v, c):
    """dot(v, c) for register 3-list v and concrete 3-vector c."""
    acc = None
    for i in range(3):
        ci = float(c[i])
        if ci == 0.0:
            continue
        term = v[i] if ci == 1.0 else v[i] * ci
        acc = term if acc is None else acc + term
    if acc is None:
        return jnp.zeros_like(v[0])
    return acc


def add_scaled(acc, s, c):
    """acc[i] += s * c[i] for concrete 3-vector c (in place on the list)."""
    for i in range(3):
        ci = float(c[i])
        if ci == 0.0:
            continue
        acc[i] = acc[i] + (s if ci == 1.0 else s * ci)
    return acc


def cross_const_vec(c, v):
    """cross(c, v) for concrete 3-vector c and register 3-list v."""
    cx, cy, cz = (float(c[0]), float(c[1]), float(c[2]))

    def term(a, p, b, q):
        # a*p - b*q with zero skipping
        left = None if a == 0.0 else (p if a == 1.0 else p * a)
        right = None if b == 0.0 else (q if b == 1.0 else q * b)
        if left is None and right is None:
            return jnp.zeros_like(v[0])
        if left is None:
            return -right
        if right is None:
            return left
        return left - right

    return [
        term(cy, v[2], cz, v[1]),
        term(cz, v[0], cx, v[2]),
        term(cx, v[1], cy, v[0]),
    ]


def matvec_const(M, v):
    """M @ v for concrete 3x3 numpy M and register 3-list v (zero-skipped)."""
    return [dot_const(v, M[i]) for i in range(3)]


def matvec_t_const(M, v):
    """M.T @ v for concrete 3x3 numpy M and register 3-list v."""
    return [dot_const(v, M[:, i]) for i in range(3)]


def grid_call(kernel, packed, seed, tile: int):
    """Shared pallas_call launcher for the folded (rows, 8, N/8) state
    layout every vehicle kernel uses: scalar-prefetched seed, 1-D grid over
    lane tiles, identity block mapping. One definition so a grid/tiling
    change lands everywhere at once (the row count comes from the operand)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, sublanes, lanes = packed.shape
    tile = min(tile, lanes)
    if lanes % tile:
        # non-divisible env counts (e.g. 12288 envs -> lanes=1536 vs
        # tile=1024) degrade to the largest divisor instead of dying; the
        # grid just gets more, smaller launches. Lanes is always a multiple
        # of 128 upstream (packed envs pad to the vreg lane width).
        tile = max(d for d in range(1, tile + 1) if lanes % d == 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(lanes // tile,),
        in_specs=[
            pl.BlockSpec((rows, sublanes, tile), lambda i, s: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((rows, sublanes, tile), lambda i, s: (0, 0, i)),
    )
    # interpret mode when forced (tests, dryrun) or whenever the backend is
    # CPU — Mosaic only lowers on TPU, and auto-detecting makes standalone
    # CPU scripts (eval of a packed env, examples) just work
    interpret = _FORCE_INTERPRET or jax.default_backend() == "cpu"
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(packed.shape, packed.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.atleast_1d(seed).astype(jnp.int32), packed)


def waypoint_track(R, lp, tgt, rem, ndist, NT, goal):
    """Register-level waypoint tracking shared by the quadx and fixedwing
    fused kernels (envs/utils/waypoints.py semantics on the cyclically
    rolled in-kernel target layout; see ops/pallas_fixedwing.py's row
    docs). ``R`` is the flattened pre-integration rotation (9 registers),
    ``lp`` the lagged position (3), ``tgt`` 12 rolled target rows, ``rem``
    the remaining count, ``ndist`` the previous new-distance memo.

    Returns ``(tgt_c, rem_c, ndist_new, odist_c, progress, tdlt_c,
    reached, all_reached)`` — the caller applies its env's reward shaping
    (the proximity coefficient differs per env) and bookkeeping.
    """
    import jax.numpy as jnp

    r00, r01, r02, r10, r11, r12, r20, r21, r22 = R
    # update_distances: world->body deltas for every (rolled) target
    deltas = []
    for k in range(NT):
        dxk = tgt[3 * k] - lp[0]
        dyk = tgt[3 * k + 1] - lp[1]
        dzk = tgt[3 * k + 2] - lp[2]
        deltas.append([
            r00 * dxk + r10 * dyk + r20 * dzk,
            r01 * dxk + r11 * dyk + r21 * dzk,
            r02 * dxk + r12 * dyk + r22 * dzk,
        ])
    d0 = deltas[0]
    ndist_new = jnp.sqrt(d0[0] * d0[0] + d0[1] * d0[1] + d0[2] * d0[2])
    odist_c = ndist  # old <- previous new
    progress = odist_c - ndist_new

    # target_deltas obs: pre-advance, rows >= remaining zeroed
    # (envs/utils/waypoints.py remaining_deltas)
    tdlt_c = []
    for k in range(NT):
        keep_k = (rem > (k + 0.5)).astype(jnp.float32)
        tdlt_c += [deltas[k][i] * keep_k for i in range(3)]
    tdlt_c += [jnp.zeros_like(rem)] * (12 - 3 * NT)

    reached = ((ndist_new < goal) & (rem > 0.5)).astype(jnp.float32)
    # advance: cyclic roll so the next target lands on row 0
    tgt_c = [
        jnp.where(
            reached > 0.0,
            tgt[(3 * (k + 1) + i) % (3 * NT)],
            tgt[3 * k + i],
        )
        for k in range(NT)
        for i in range(3)
    ] + tgt[3 * NT :]
    rem_c = rem - reached
    all_reached = (rem_c < 0.5).astype(jnp.float32)
    return (
        tgt_c, rem_c, ndist_new, odist_c, progress, tdlt_c, reached,
        all_reached,
    )
