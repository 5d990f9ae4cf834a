"""Round-4 PPO >=20M part J: the big-batch epoch shuffle gather.

Part I anatomy at (65536 envs, 3ep x 512mb): the per-epoch block-shuffle
gather costs 41.65 ms standalone — 38 GB/s effective on a 1.6 GB
read+write that should run at HBM rate (~2 ms), and x3 epochs it is ~40%
of the SGD phase. This probe races gather formulations that produce
IDENTICAL minibatch rows for the same permutation (pure layout refactor):

  g3d  — current: packed.reshape(nb, blk, feat)[perm].reshape(mb shapes)
  g2d  — flatten each block to one row first:
         packed.reshape(nb, blk*feat)[perm].reshape(mb shapes)
  take — jnp.take(..., axis=0) on the 2D form (explicit gather op)
  blk4096 — g2d at 4-KB-row granularity (4096-row blocks; composition
         changes per epoch less — measured for the curve only)

Each is checked for exact equality against g3d, then timed.

Run (holds the TPU):
    timeout 3600 python docs/artifacts/ppo_20m_r4j.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ART = "/root/repo/docs/artifacts"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

OUT = f"{ART}/ppo_20m_r4j_tpu.jsonl"
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
key = jax.random.PRNGKey(0)
packed = jax.random.normal(key, (N, FEAT), jnp.float32)

for blk in (1024, 4096):
    nb = N // blk
    perm = jax.random.permutation(jax.random.PRNGKey(1), nb)

    @jax.jit
    def g3d(packed, perm):
        return packed.reshape((nb, blk, FEAT))[perm].reshape((MBS, MB, FEAT))

    @jax.jit
    def g2d(packed, perm):
        return packed.reshape((nb, blk * FEAT))[perm].reshape((MBS, MB, FEAT))

    @jax.jit
    def gtake(packed, perm):
        return jnp.take(
            packed.reshape((nb, blk * FEAT)), perm, axis=0,
            unique_indices=True, indices_are_sorted=False,
        ).reshape((MBS, MB, FEAT))

    ref = g3d(packed, perm)
    for name, fn in (("g3d", g3d), ("g2d", g2d), ("take2d", gtake)):
        out = fn(packed, perm)
        same = bool(jnp.array_equal(out, ref))
        dt = timeit(fn, packed, perm)
        gbs = 2 * N * FEAT * 4 / dt / 1e9
        emit({"stage": "gather", "blk": blk, "variant": name,
              "ms": round(dt * 1e3, 2), "eff_GBps": round(gbs, 1),
              "identical_to_g3d": same})
        del out

print("PPO-20M-J DONE in", round(time.time() - T0), "s", flush=True)
