"""Extended benchmark suite (documentation; the driver runs bench.py).

Prints one JSON line per workload covering every major subsystem:
vectorized env stepping per vehicle family, the multi-agent arena, and the
fused PPO train iteration. Run on the real TPU:

    timeout 1800 python bench_suite.py
"""

import json
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=2):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def bench_env(name, env, num_envs, steps, action, reps=2):
    from pyflyt_tpu.envs import autoreset_init, cached_autoreset_step

    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    ars, _ = jax.jit(lambda k: autoreset_init(env, k))(keys)

    @jax.jit
    def chunk(ars):
        def body(a, _):
            a, out = cached_autoreset_step(env, a, action, refresh=64)
            return a, out.reward
        return jax.lax.scan(body, ars, None, length=steps)

    dt = timeit(chunk, ars, reps=reps)
    print(json.dumps({
        "metric": f"{name} env-steps/s ({num_envs} envs)",
        "value": round(num_envs * steps / dt),
        "unit": "env-steps/s",
    }), flush=True)


def bench_fused(name, env, num_envs, steps, action, agents=1):
    """Fused-kernel env bench: jit a scan over env.step, report steps/s.
    ``steps`` trades per-call dispatch against compile time (heavier kernels
    use shorter chunks)."""
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state, _ = jax.jit(env.reset)(keys)

    @jax.jit
    def chunk(s):
        def body(s, _):
            s, out = env.step(s, action)
            return s, out.reward
        return jax.lax.scan(body, s, None, length=steps)

    dt = timeit(chunk, state)
    unit = "agent-steps/s" if agents > 1 else "env-steps/s"
    print(json.dumps({
        "metric": f"{name} fused-kernel {unit} ({num_envs} envs)",
        "value": round(num_envs * agents * steps / dt),
        "unit": unit,
    }), flush=True)


def check_fused_parity():
    """Real-lowering (Mosaic) parity gates for the fused kernels that the CPU
    test suite can only exercise in interpret mode — and, for the dogfight,
    only at raised agent rates (XLA:CPU compile of the 16-iteration stock
    arena is intractable; see tests/test_pallas_dogfight.py). Noise off,
    stock configs, a few chained agent steps vs the vmapped XLA envs.

    Runs under ``jax.default_matmul_precision("float32")``: with the TPU
    default (bf16 MXU passes) the XLA envs' own small rotation einsums carry
    ~0.5% relative error and the comparison measures the XLA env's noise,
    not the kernel's (measured on v5e: fixedwing obs diff 2.5e-1 default vs
    7.6e-6 under f32 — the scalar-register kernels are the MORE accurate
    path on TPU)."""
    import numpy as np

    from pyflyt_tpu.envs import (
        FixedwingWaypointsEnv,
        QuadXWaypointsEnv,
        RocketLandingEnv,
    )
    from pyflyt_tpu.envs.base import vec_reset
    from pyflyt_tpu.envs.ma_fixedwing_dogfight import MAFixedwingDogfightEnv
    from pyflyt_tpu.envs.packed_dogfight import PackedMAFixedwingDogfightEnv
    from pyflyt_tpu.envs.packed_fixedwing_waypoints import (
        PackedFixedwingWaypointsEnv,
    )
    from pyflyt_tpu.envs.packed_quadx_waypoints import PackedQuadXWaypointsEnv
    from pyflyt_tpu.envs.packed_rocket_landing import PackedRocketLandingEnv

    n, steps = 64, 4

    def gate(name, ref_step, ref_st, pk_step, pk_st, act, atol):
        for i in range(steps):
            ref_st, ref_out = ref_step(ref_st, act)
            pk_st, out = pk_step(pk_st, act)
            for got, want in zip(
                jax.tree.leaves(out.obs), jax.tree.leaves(ref_out.obs)
            ):
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want),
                    atol=atol * (i + 1), err_msg=f"{name} step {i} obs",
                )
            np.testing.assert_allclose(
                np.asarray(out.reward), np.asarray(ref_out.reward),
                atol=atol * (i + 1), rtol=1e-3,
                err_msg=f"{name} step {i} reward",
            )
            np.testing.assert_array_equal(
                np.asarray(out.termination), np.asarray(ref_out.termination),
                err_msg=f"{name} step {i} termination",
            )
        print(json.dumps({"metric": f"{name} mosaic-parity", "value": 1,
                          "unit": "ok"}), flush=True)

    keys = jax.random.split(jax.random.PRNGKey(7), n)

    with jax.default_matmul_precision("float32"):
        fw = FixedwingWaypointsEnv(noisy_motors=False)
        pfw = PackedFixedwingWaypointsEnv(base=fw)
        ref_st, _ = vec_reset(fw, keys)
        pk_st, _ = jax.jit(pfw.reset)(keys)
        act = jnp.tile(jnp.asarray([0.0, 0.05, 0.0, 0.7]), (n, 1))
        gate("Fixedwing-Waypoints", jax.jit(jax.vmap(fw.step)), ref_st,
             jax.jit(pfw.step), pk_st, act, atol=1e-3)

        rk = RocketLandingEnv(noisy_boosters=False)
        prk_env = PackedRocketLandingEnv(base=rk)
        ref_st, _ = vec_reset(rk, keys)
        pk_st, _ = jax.jit(prk_env.reset)(keys)
        act = jnp.tile(
            jnp.asarray([0.0, 0.0, 0.0, 1.0, 0.5, 0.0, 0.0]), (n, 1)
        )
        gate("Rocket-Landing", jax.jit(jax.vmap(rk.step)), ref_st,
             jax.jit(prk_env.step), pk_st, act, atol=1e-3)

        dg = MAFixedwingDogfightEnv(noisy_motors=False)
        pdg_env = PackedMAFixedwingDogfightEnv(base=dg)
        ref_st, _ = jax.jit(jax.vmap(dg.reset))(keys)
        pk_st, _ = jax.jit(pdg_env.reset)(keys)
        act = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.8]), (n, 2, 1))
        gate("MA-Dogfight", jax.jit(jax.vmap(dg.step)), ref_st,
             jax.jit(pdg_env.step), pk_st, act, atol=2e-3)

        # last: the newest gates (heaviest compile — mode-7 cascade +
        # waypoint rows), so the proven gates report first
        qw = QuadXWaypointsEnv(noisy_motors=False, flight_mode=7)
        pqw = PackedQuadXWaypointsEnv(base=qw)
        ref_st, _ = vec_reset(qw, keys)
        pk_st, _ = jax.jit(pqw.reset)(keys)
        act = jnp.tile(jnp.asarray([0.5, 0.5, 0.0, 1.0]), (n, 1))
        gate("QuadX-Waypoints", jax.jit(jax.vmap(qw.step)), ref_st,
             jax.jit(pqw.step), pk_st, act, atol=1e-3)

        # packed mod-hovering (the PPO native-batch rollout env): mode 9 +
        # NED + per-env wind base (gusts off for determinism). Obs is
        # state16 rounded to 3 decimals (hovering.py _round3) so diffs land
        # on the 1e-3 quantum — atol accommodates one quantum per step.
        from pyflyt_tpu.envs.quadx_mod import QuadXModHoveringEnv
        from pyflyt_tpu.envs.quadx_mod.packed_hovering import (
            PackedQuadXModHoveringEnv,
        )

        mh = QuadXModHoveringEnv(
            flight_mode=9, orn_conv="NED_FRD", control_hz=80,
            noisy_motors=False, simulate_wind=True, max_gust_strength=0.0,
        )
        pmh = PackedQuadXModHoveringEnv(base=mh)
        ref_st, _ = vec_reset(mh, keys)
        pk_st, _ = jax.jit(pmh.reset)(keys)
        act = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.0]), (n, 1))
        gate("Packed-Mod-Hovering", jax.jit(jax.vmap(mh.step)), ref_st,
             jax.jit(pmh.step), pk_st, act, atol=2e-3)


def check_kernel_envelope():
    """Real-lowering gates for the quadx kernel envelope beyond the fused
    envs' configurations: mode 9 (raw motor mix), NED_FRD (modes 0 and 9),
    and the baked deterministic gaussian wind — the paths the CPU suite
    only exercises in interpret mode (tests/test_pallas_quadx.py:179-290;
    VERDICT r2 weak-item 1 asked for these on hardware)."""
    import numpy as np

    from pyflyt_tpu.models import quadx
    from pyflyt_tpu.ops import pallas_quadx

    def report(name):
        print(json.dumps({"metric": f"quadx-kernel {name} mosaic-parity",
                          "value": 1, "unit": "ok"}), flush=True)

    n = 128
    key = jax.random.PRNGKey(12)

    def spawn(cfg, params, z, seed=12):
        k = jax.random.PRNGKey(seed)
        pos = jax.random.uniform(k, (n, 3), minval=-2, maxval=2) + jnp.asarray(
            [0.0, 0.0, z]
        )
        orn = jax.random.uniform(
            jax.random.fold_in(k, 1), (n, 3), minval=-0.3, maxval=0.3
        )
        st = quadx.init_state(params, cfg, pos, orn)
        return st.replace(read=quadx.update_state(st.body, cfg))

    with jax.default_matmul_precision("float32"):
        # mode 9 + NED (the solved RL recipe's exact configuration)
        for orn_conv, z in (("ENU_FLU", 5.0), ("NED_FRD", -5.0)):
            for mode in (0, 9):
                cfg = quadx.QuadXConfig(noisy_motors=False, orn_conv=orn_conv)
                params = quadx.build_params(cfg)
                st = spawn(cfg, params, z)
                st = quadx.set_mode(st, mode, cfg)
                neg = -1.0 if orn_conv == "NED_FRD" else 1.0
                sp = (
                    jax.random.uniform(key, (n, 4), minval=-0.3, maxval=0.3)
                    .at[:, 3].set(0.4 * neg)
                    if mode == 0
                    else jax.random.uniform(
                        key, (n, 4), minval=-0.05, maxval=0.05
                    ).at[:, 3].set(0.4)
                )
                st = st.replace(setpoint=sp)
                ref_step = jax.jit(lambda s: quadx.step(s, params, cfg, mode))
                krn_step = jax.jit(
                    lambda s: pallas_quadx.step(s, params, cfg, mode)
                )
                ref = out = st
                for _ in range(8):
                    ref, _ = ref_step(ref)
                    out, _ = krn_step(out)
                np.testing.assert_allclose(
                    np.asarray(out.body.pos), np.asarray(ref.body.pos),
                    atol=1e-4, err_msg=f"{orn_conv} mode {mode} pos",
                )
                np.testing.assert_allclose(
                    np.asarray(out.read.view), np.asarray(ref.read.view),
                    atol=2e-4, err_msg=f"{orn_conv} mode {mode} view",
                )
                report(f"mode{mode}-{orn_conv}")

        # baked deterministic gaussian wind vs the XLA path's wind_fn
        cfg = quadx.QuadXConfig(noisy_motors=False)
        params = quadx.build_params(cfg)
        st = spawn(cfg, params, 5.0, seed=5)
        st = st.replace(
            setpoint=jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.42]), (n, 1))
        )
        st = quadx.set_mode(st, 0, cfg)
        base = (3.0, -1.5, 0.5)
        wind_fn = lambda step, p: jnp.broadcast_to(  # noqa: E731
            jnp.asarray(base, p.dtype), p.shape
        )
        ref_step = jax.jit(lambda s: quadx.step(s, params, cfg, 0, wind_fn=wind_fn))
        krn_step = jax.jit(
            lambda s: pallas_quadx.step(
                s, params, cfg, 0,
                wind={"kind": "gaussian", "base": base, "max_gust": 0.0},
            )
        )
        ref = out = st
        for _ in range(12):
            ref, _ = ref_step(ref)
            out, _ = krn_step(out)
        np.testing.assert_allclose(
            np.asarray(out.body.pos), np.asarray(ref.body.pos), atol=5e-4,
            err_msg="gaussian wind pos",
        )
        report("gaussian-wind")


def main():
    from pyflyt_tpu.envs import (
        FixedwingWaypointsEnv,
        QuadXHoverEnv,
        RocketLandingEnv,
    )
    from pyflyt_tpu.envs.ma_fixedwing_dogfight import MAFixedwingDogfightEnv
    from pyflyt_tpu.rl import PPO, PPOConfig

    check_fused_parity()
    check_kernel_envelope()

    bench_env(
        "QuadX-Hover", QuadXHoverEnv(), 8192, 128,
        jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.36]), (8192, 1)),
    )

    # fused-kernel hover env (the bench.py headline path)
    from pyflyt_tpu.envs.packed_hover import (
        PackedQuadXHoverEnv, packed_autoreset_init, packed_cached_autoreset_step,
    )

    penv = PackedQuadXHoverEnv(base=QuadXHoverEnv())
    pkeys = jax.random.split(jax.random.PRNGKey(0), 8192)
    pars, _ = jax.jit(lambda k: packed_autoreset_init(penv, k))(pkeys)
    pact = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.36]), (8192, 1))

    @jax.jit
    def packed_chunk(a):
        def body(a, _):
            a, out = packed_cached_autoreset_step(penv, a, pact, refresh=64)
            return a, out.reward
        return jax.lax.scan(body, a, None, length=128)

    dt = timeit(packed_chunk, pars)
    print(json.dumps({
        "metric": "QuadX-Hover fused-kernel env-steps/s (8192 envs)",
        "value": round(8192 * 128 / dt),
        "unit": "env-steps/s",
    }), flush=True)
    from pyflyt_tpu.envs import QuadXWaypointsEnv

    bench_env(
        "QuadX-Waypoints", QuadXWaypointsEnv(flight_mode=7), 8192, 128,
        jnp.tile(jnp.asarray([0.5, 0.5, 0.0, 1.0]), (8192, 1)),
    )

    # fused-kernel quadx waypoints env (ops/pallas_quadx.py waypoint fusion)
    from pyflyt_tpu.envs.packed_quadx_waypoints import PackedQuadXWaypointsEnv

    bench_fused(
        "QuadX-Waypoints",
        PackedQuadXWaypointsEnv(base=QuadXWaypointsEnv(flight_mode=7)),
        8192, 128, jnp.tile(jnp.asarray([0.5, 0.5, 0.0, 1.0]), (8192, 1)),
    )

    bench_env(
        "Fixedwing-Waypoints", FixedwingWaypointsEnv(), 4096, 64,
        jnp.tile(jnp.asarray([0.0, 0.05, 0.0, 0.7]), (4096, 1)),
    )

    # fused-kernel fixedwing waypoints env (ops/pallas_fixedwing.py)
    from pyflyt_tpu.envs.packed_fixedwing_waypoints import (
        PackedFixedwingWaypointsEnv,
    )

    bench_fused(
        "Fixedwing-Waypoints",
        PackedFixedwingWaypointsEnv(base=FixedwingWaypointsEnv()),
        4096, 64, jnp.tile(jnp.asarray([0.0, 0.05, 0.0, 0.7]), (4096, 1)),
    )

    bench_env(
        "Rocket-Landing", RocketLandingEnv(), 4096, 64,
        jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0, 0.5, 0.0, 0.0]), (4096, 1)),
    )

    # fused-kernel rocket landing env (ops/pallas_rocket.py)
    from pyflyt_tpu.envs.packed_rocket_landing import PackedRocketLandingEnv

    bench_fused(
        "Rocket-Landing",
        PackedRocketLandingEnv(base=RocketLandingEnv()),
        4096, 64,
        jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0, 0.5, 0.0, 0.0]), (4096, 1)),
    )

    # multi-agent dogfight (vmapped over matches)
    dog = MAFixedwingDogfightEnv()
    matches = 2048
    keys = jax.random.split(jax.random.PRNGKey(0), matches)
    state, _ = jax.jit(jax.vmap(dog.reset))(keys)
    actions = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.8]), (matches, 2, 1))

    @jax.jit
    def dog_chunk(state):
        def body(s, _):
            s, out = jax.vmap(dog.step)(s, actions)
            return s, out.reward
        return jax.lax.scan(body, state, None, length=32)

    dt = timeit(dog_chunk, state)
    print(json.dumps({
        "metric": f"MA-Dogfight agent-steps/s ({matches} matches x 2 agents)",
        "value": round(matches * 2 * 32 / dt),
        "unit": "agent-steps/s",
    }), flush=True)

    # fused-kernel dogfight (ops/pallas_dogfight.py): both drones of an
    # arena in one lane, whole agent step in one pallas_call
    from pyflyt_tpu.envs.packed_dogfight import PackedMAFixedwingDogfightEnv

    bench_fused(
        "MA-Dogfight", PackedMAFixedwingDogfightEnv(base=dog),
        matches, 32,
        jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.8]), (matches, 2, 1)),
        agents=2,
    )

    # the round-3 headline config for the refolded drone-per-lane kernel:
    # 8192 matches, default tile 512, longer chunks — regression gate for
    # the 44.6M agent-steps/s layout win
    # (docs/artifacts/dogfight_layout_sweep_tpu.jsonl)
    bench_fused(
        "MA-Dogfight-8192", PackedMAFixedwingDogfightEnv(base=dog),
        8192, 64,
        jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.8]), (8192, 2, 1)),
        agents=2,
    )

    # vision task: QuadX-Gates with the on-device ray-cast FPV render
    # (core/camera.py) at the reference's 128x128 resolution
    # (quadx_gates_env.py:69-84). The render dominates: each env-step casts
    # 128*128 rays against 5 holed gate boxes (exact CSG of the 4-bar
    # frames) + ground. Round-4 config: 64-step chunks (the old 8-step
    # chunks measured dispatch, not render: 108K vs 297K for the same
    # geometry) — docs/artifacts/gates_render_r4_tpu.jsonl: 392K @ 256
    # envs, 536K @ 1024.
    from pyflyt_tpu.envs.quadx_gates import QuadXGatesEnv

    gates = QuadXGatesEnv()
    g_envs, g_steps = 256, 64
    # reps=6: at ~40 ms/chunk this row sits in tunnel-latency noise at the
    # default 2 reps — bench_suite_r4b read 280K where the identical
    # dedicated bench (gates_render_r4.py, reps=3, fresh process) read
    # 392K; more reps tighten the gate (VERDICT r4 weak #7)
    bench_env(
        "QuadX-Gates (128x128 raycast)", gates, g_envs, g_steps,
        jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 0.5]), (g_envs, 1)),
        reps=6,
    )

    # fused PPO train iteration
    ppo = PPO(
        QuadXHoverEnv(),
        PPOConfig(num_envs=4096, rollout_steps=32, num_epochs=4,
                  num_minibatches=16, cached_reset_refresh=64),
    )
    runner = ppo.init(jax.random.PRNGKey(0))
    it = jax.jit(ppo.train_iteration)
    dt = timeit(it, runner)
    print(json.dumps({
        "metric": "PPO train-steps/s (4096 envs, rollout+GAE+4x16 SGD)",
        "value": round(ppo.config.batch_size / dt),
        "unit": "env-steps/s",
    }), flush=True)

    # the full mode-9 hovering training recipe at scale (the round-3
    # headline learner config: packed epoch shuffle + auto blocks +
    # flattened optimizer; see docs/artifacts/ppo_shuffle_fix_tpu.jsonl)
    from pyflyt_tpu.envs.quadx_mod import QuadXModHoveringEnv

    ppo9 = PPO(
        QuadXModHoveringEnv(flight_mode=9, orn_conv="NED_FRD",
                            control_hz=80, simulate_wind=True),
        PPOConfig(num_envs=8192, rollout_steps=128, num_epochs=10,
                  num_minibatches=64, learning_rate=1e-4, clip_eps=0.1,
                  init_log_std=-1.6),
    )
    runner9 = ppo9.init(jax.random.PRNGKey(0))
    it9 = jax.jit(ppo9.train_iteration)
    dt9 = timeit(it9, runner9)
    print(json.dumps({
        "metric": "PPO train-steps/s (8192 envs, mode-9 recipe, 10x64 SGD)",
        "value": round(ppo9.config.batch_size / dt9),
        "unit": "env-steps/s",
    }), flush=True)

    # fused-SGD epoch kernel (ops/pallas_sgd.py): Mosaic parity gate (same
    # rollouts -> same shuffles; params must track the XLA path within
    # bf16-accumulation drift over 2 iterations) + the same recipe benched
    # with fused epochs
    import dataclasses as _dc

    import numpy as _np

    cfgp = PPOConfig(num_envs=256, rollout_steps=32, num_epochs=2,
                     num_minibatches=8, learning_rate=1e-4, clip_eps=0.1,
                     init_log_std=-1.6)
    envp = QuadXModHoveringEnv(flight_mode=9, orn_conv="NED_FRD",
                               control_hz=80, simulate_wind=True)
    leaves = {}
    for fused in (False, True):
        pp = PPO(envp, _dc.replace(cfgp, fused_sgd=fused))
        rr = pp.init(jax.random.PRNGKey(0))
        itp = jax.jit(pp.train_iteration)
        rr, mm = itp(rr)
        rr, mm = itp(rr)
        jax.block_until_ready(rr.params)
        leaves[fused] = jax.tree.leaves(rr.params)
    max_abs = max(
        float(_np.max(_np.abs(_np.asarray(a) - _np.asarray(b))))
        for a, b in zip(leaves[False], leaves[True])
    )
    assert max_abs < 2e-3, f"fused-SGD param drift {max_abs}"
    print(json.dumps({"metric": "fused-SGD mosaic-parity", "value": 1,
                      "unit": "ok", "max_abs_param_diff": max_abs}),
          flush=True)

    # fused policy/value rollout forward (ops/pallas_policy.py): Mosaic
    # parity vs network.apply on the same obs batch (round-4; probe r4n
    # measured the bf16 forwards bit-identical on v5e — gate at loose
    # truncation tolerance anyway)
    from pyflyt_tpu.ops import pallas_policy as _pp
    from pyflyt_tpu.ops import pallas_sgd as _ps

    ppv = PPO(envp, cfgp)
    rrv = ppv.init(jax.random.PRNGKey(1))
    obs_v = jax.random.normal(
        jax.random.PRNGKey(2), (2048, rrv.obs.shape[-1]), jnp.float32
    )
    mean_w, _, val_w = jax.jit(ppv.network.apply)(rrv.params, obs_v)
    fwd_v = _pp.build_policy_value_forward(
        obs_dim=int(obs_v.shape[-1]), act_dim=4,
        pi_sizes=tuple(cfgp.feature_sizes), vf_sizes=tuple(cfgp.feature_sizes),
    )
    mean_k, val_k = fwd_v(obs_v, _ps.params_to_leaves(rrv.params))
    dm = float(_np.max(_np.abs(_np.asarray(mean_k) - _np.asarray(mean_w))))
    dv = float(_np.max(_np.abs(_np.asarray(val_k) - _np.asarray(val_w))))
    assert dm < 2e-3 and dv < 2e-2, f"policy-forward drift {dm}/{dv}"
    print(json.dumps({"metric": "fused-policy-forward mosaic-parity",
                      "value": 1, "unit": "ok", "max_abs_mean_diff": dm,
                      "max_abs_value_diff": dv}), flush=True)
    del ppv, rrv

    # the same recipe with the packed native-batch rollout (the mod-hovering
    # physics in the folded kernel layout; rl/ppo.py native_batch) — the
    # round-3 headline learner path: 8.09M env-steps/s on v5e
    # (docs/artifacts/ppo_shuffle_fix_tpu.jsonl)
    from pyflyt_tpu.envs.quadx_mod.packed_hovering import (
        PackedQuadXModHoveringEnv,
    )

    ppo9p = PPO(
        PackedQuadXModHoveringEnv.create(
            flight_mode=9, orn_conv="NED_FRD", control_hz=80,
            simulate_wind=True),
        PPOConfig(num_envs=8192, rollout_steps=128, num_epochs=10,
                  num_minibatches=64, learning_rate=1e-4, clip_eps=0.1,
                  init_log_std=-1.6),
    )
    runner9p = ppo9p.init(jax.random.PRNGKey(0))
    it9p = jax.jit(ppo9p.train_iteration)
    dt9p = timeit(it9p, runner9p)
    print(json.dumps({
        "metric": "PPO train-steps/s (8192 envs, mode-9 recipe, packed rollout)",
        "value": round(ppo9p.config.batch_size / dt9p),
        "unit": "env-steps/s",
    }), flush=True)

    ppo9f = PPO(envp, _dc.replace(
        PPOConfig(num_envs=8192, rollout_steps=128, num_epochs=10,
                  num_minibatches=64, learning_rate=1e-4, clip_eps=0.1,
                  init_log_std=-1.6), fused_sgd=True))
    runner9f = ppo9f.init(jax.random.PRNGKey(0))
    it9f = jax.jit(ppo9f.train_iteration)
    dt9f = timeit(it9f, runner9f)
    print(json.dumps({
        "metric": "PPO train-steps/s (8192 envs, mode-9 recipe, fused SGD)",
        "value": round(ppo9f.config.batch_size / dt9f),
        "unit": "env-steps/s",
    }), flush=True)
    del runner9f, ppo9f

    # round-4 solve recipe (3 epochs x minibatch-8192/16384, lr 2e-4 —
    # mode-9 solves at 0.67-0.92B steps, docs/artifacts/ppo_20m_r4b/
    # r4m_tpu.jsonl) measured device-resident: 4 train iterations chained
    # in one lax.scan dispatch, the way on-chip training runs (per-call
    # tunnel round-trips otherwise add 10-20% noise — ppo_20m_r4l).
    for n_envs, mbs in ((8192, 128), (32768, 256)):
        cfgs4 = PPOConfig(num_envs=n_envs, rollout_steps=128, num_epochs=3,
                          num_minibatches=mbs, learning_rate=2e-4,
                          clip_eps=0.1, init_log_std=-1.6)
        pp4 = PPO(PackedQuadXModHoveringEnv.create(
            flight_mode=9, orn_conv="NED_FRD", control_hz=80,
            simulate_wind=True), cfgs4)
        rr4 = pp4.init(jax.random.PRNGKey(0))

        @jax.jit
        def chain4(r, pp4=pp4):
            def body(x, _):
                x, _m = pp4.train_iteration(x)
                return x, ()
            return jax.lax.scan(body, r, None, length=4)[0]

        dt4 = timeit(chain4, rr4) / 4
        print(json.dumps({
            "metric": (f"PPO train-steps/s ({n_envs} envs, r4 solve recipe "
                       "3ep, packed rollout, chained)"),
            "value": round(cfgs4.batch_size / dt4),
            "unit": "env-steps/s",
        }), flush=True)
        del rr4, pp4


if __name__ == "__main__":
    main()
