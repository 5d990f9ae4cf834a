"""Round-4 Gates render perf: holed-box CSG gates vs the 4-bar union.

A race gate's 4 bars are exactly outer-box-minus-through-hole, so
camera.gate_boxes now emits ONE holed box per gate (camera.py::_ray_box's
hole path): ~3x fewer VPU ops per ray and a 4x smaller closest-hit
reduction. This probe measures the full QuadX-Gates env step (aviary
cascade + 128x128 FPV ray-cast) on the real chip:

  A  — pixel parity holed vs 4-bar at 128x128 on TPU (one frame)
  B  — env-steps/s, 4-bar(old) vs holed(new), 256 envs, 64-step chunks
  C  — holed path batch scaling: 256 / 512 / 1024 envs

Run (holds the TPU):
    timeout 3600 python docs/artifacts/gates_render_r4.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ART = "/root/repo/docs/artifacts/gates_render_r4_tpu.jsonl"
T0 = time.time()
print("devices:", jax.devices(), flush=True)

from pyflyt_tpu.core import camera as cam  # noqa: E402
from pyflyt_tpu.envs import autoreset_init, cached_autoreset_step  # noqa: E402
from pyflyt_tpu.envs.quadx_gates import QuadXGatesEnv  # noqa: E402

open(ART, "w").close()


def emit(row):
    row = dict(row, wall_s=round(time.time() - T0))
    with open(ART, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row)[:300], flush=True)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps


# ---- stage A: on-chip pixel parity at full resolution ------------------------
key = jax.random.PRNGKey(0)
pos = jax.random.uniform(key, (5, 3), minval=-3.0, maxval=3.0).at[:, 2].add(4.0)
eul = jax.random.uniform(jax.random.fold_in(key, 1), (5, 3), minval=-1.2, maxval=1.2)
col = jnp.eye(4)[jnp.arange(5) % 4] * 0.8 + 0.2
eye = jnp.asarray([0.0, -6.0, 5.0])
view = jnp.asarray([0.0, 0.3, 1.2])
r_h = jax.jit(lambda: cam.capture_image(eye, view, cam.gate_boxes(pos, eul, col),
                                        resolution=(128, 128))[0])()
r_b = jax.jit(lambda: cam.capture_image(eye, view,
                                        cam.gate_boxes_segments(pos, eul, col),
                                        resolution=(128, 128))[0])()
mismatch = int((np.asarray(r_h) != np.asarray(r_b)).sum())
emit({"stage": "A", "pixels": 128 * 128 * 4, "mismatched_values": mismatch})


# ---- stage B/C: env throughput ----------------------------------------------
def bench(env, num_envs, steps=64, reps=3):
    action = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.5]), (num_envs, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    ars, _ = jax.jit(lambda k: autoreset_init(env, k))(keys)

    @jax.jit
    def chunk(a):
        def body(a, _):
            a, out = cached_autoreset_step(env, a, action, refresh=64)
            return a, out.reward
        return jax.lax.scan(body, a, None, length=steps)

    dt = timeit(chunk, ars, reps=reps)
    return round(num_envs * steps / dt)


env = QuadXGatesEnv()

# old path: monkeypatch the gate geometry back to the 4-bar union
_orig = cam.gate_boxes
cam.gate_boxes = cam.gate_boxes_segments
emit({"stage": "B", "variant": "4-bar union (old)", "num_envs": 256,
      "env_steps_per_s": bench(env, 256)})
cam.gate_boxes = _orig

for n in (256, 512, 1024):
    emit({"stage": "B" if n == 256 else "C", "variant": "holed-box CSG",
          "num_envs": n, "env_steps_per_s": bench(env, n)})

print("GATES-RENDER-R4 DONE in", round(time.time() - T0), "s", flush=True)
