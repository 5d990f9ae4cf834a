"""Round-4 PPO >=20M part J2: lane-align the shuffle gather.

Part J: every gather formulation of the epoch shuffle runs at 20-46 GB/s.
Diagnosis: the packed buffer's minor dim is feat=24 floats (96 B) — 19%
of a (8, 128) vreg — so the copy wastes ~5x of the HBM stream. A block of
blk=1024 rows is 24576 floats = exactly 192 x 128: viewing the buffer as
(nb, 192, 128) makes every gathered block perfectly lane-tiled, and the
reshapes are bit-exact row-major views.

  aligned3d — packed.reshape(nb, 192, 128)[perm] -> reshape back
  pallas    — scalar-prefetched DMA copy kernel (grid=(nb,), index_map
              reads the permutation): Mosaic double-buffers whole-block
              HBM->HBM copies
Both checked for exact row equality vs the part-J reference formulation.

Run (holds the TPU):
    timeout 3600 python docs/artifacts/ppo_20m_r4j2.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ART = "/root/repo/docs/artifacts"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

OUT = f"{ART}/ppo_20m_r4j2_tpu.jsonl"
open(OUT, "w").close()


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:400], flush=True)


def timeit(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


N, FEAT = 65536 * 128, 24
MBS, MB = 512, 65536 * 128 // 512
BLK = 1024
NB = N // BLK
ROWS = BLK * FEAT // 128  # 192
key = jax.random.PRNGKey(0)
packed = jax.random.normal(key, (N, FEAT), jnp.float32)
perm = jax.random.permutation(jax.random.PRNGKey(1), NB)


@jax.jit
def g3d(packed, perm):
    return packed.reshape((NB, BLK, FEAT))[perm].reshape((MBS, MB, FEAT))


@jax.jit
def aligned3d(packed, perm):
    return packed.reshape((NB, ROWS, 128))[perm].reshape((MBS, MB, FEAT))


def _copy_kernel(perm_ref, x_ref, o_ref):
    o_ref[...] = x_ref[...]


@jax.jit
def pallas_shuffle(packed, perm):
    out = pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, ROWS, 128), lambda i, perm: (perm[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, ROWS, 128), lambda i, perm: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((NB, ROWS, 128), jnp.float32),
    )(perm, packed.reshape((NB, ROWS, 128)))
    return out.reshape((MBS, MB, FEAT))


ref = g3d(packed, perm)
for name, fn in (("g3d", g3d), ("aligned3d", aligned3d),
                 ("pallas", pallas_shuffle)):
    try:
        out = fn(packed, perm)
        same = bool(jnp.array_equal(out, ref))
        dt = timeit(fn, packed, perm)
        gbs = 2 * N * FEAT * 4 / dt / 1e9
        emit({"stage": "gather", "variant": name, "ms": round(dt * 1e3, 2),
              "eff_GBps": round(gbs, 1), "identical": same})
        del out
    except Exception as e:
        emit({"stage": "gather", "variant": name, "error": repr(e)[:300]})

print("PPO-20M-J2 DONE in", round(time.time() - T0), "s", flush=True)
