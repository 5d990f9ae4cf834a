"""Wind-field model tests (reference: PyFlyt/core/wind/, base_wind_field.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pyflyt_tpu.core.wind import ConstantWind, GaussianWind, SimpleWind
from pyflyt_tpu.models import quadx


def test_wind_field_validity():
    """The reference probes fields with 5 dummy positions at z=1
    (base_wind_field.py:55-70): output must be float, shape (n, 3)."""
    pos = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (5, 1))
    step = jnp.zeros((), jnp.int32)
    for wind in (
        ConstantWind(jnp.asarray([1.0, 0.0, 0.0])),
        SimpleWind(key=jax.random.PRNGKey(0)),
        GaussianWind.init(jax.random.PRNGKey(0)),
    ):
        out = wind(step, pos)
        assert out.shape == (5, 3)
        assert jnp.issubdtype(out.dtype, jnp.floating)


def test_gaussian_wind_statistics():
    """base + clipped unit-Gaussian gusts (gaussian_wind.py:36-45)."""
    base = jnp.asarray([3.0, -2.0, 1.0])
    wind = GaussianWind.init(jax.random.PRNGKey(1), base_wind=base, max_gust=7.0)
    pos = jnp.zeros((1, 3))
    samples = jnp.stack(
        [wind(jnp.asarray(i, jnp.int32), pos)[0] for i in range(300)]
    )
    mean = np.asarray(jnp.mean(samples, axis=0))
    std = np.asarray(jnp.std(samples, axis=0))
    np.testing.assert_allclose(mean, np.asarray(base), atol=0.25)
    np.testing.assert_allclose(std, 1.0, atol=0.15)
    # resampled per physics step, constant within one
    a = wind(jnp.asarray(3, jnp.int32), pos)
    b = wind(jnp.asarray(3, jnp.int32), pos)
    c = wind(jnp.asarray(4, jnp.int32), pos)
    assert jnp.array_equal(a, b)
    assert not jnp.array_equal(a, c)


def test_gaussian_wind_ned_remap():
    """NED components emit ENU wind: (x,y,z)_ned -> (y,x,-z)_enu
    (gaussian_wind.py:48-55)."""
    base = jnp.asarray([3.0, -2.0, 1.0])
    k = jax.random.PRNGKey(2)
    enu = GaussianWind.init(k, base_wind=base, orn_conv="ENU_FLU")
    ned = GaussianWind.init(k, base_wind=base, orn_conv="NED_FRD")
    pos = jnp.zeros((1, 3))
    step = jnp.asarray(0, jnp.int32)
    we, wn = enu(step, pos)[0], ned(step, pos)[0]
    np.testing.assert_allclose(
        np.asarray(wn), np.asarray([we[1], we[0], -we[2]]), rtol=1e-6
    )


def test_simple_wind_thermal_profile():
    """z wind ~ log(z + 1) · strength (simple_wind.py:17-20)."""
    wind = SimpleWind(key=jax.random.PRNGKey(0), strength=jnp.asarray(2.0))
    pos = jnp.asarray([[0.0, 0.0, float(np.e - 1.0)]])
    # average many steps to suppress the unit-Gaussian noise term
    samples = jnp.stack(
        [wind(jnp.asarray(i, jnp.int32), pos)[0] for i in range(500)]
    )
    mean = np.asarray(jnp.mean(samples, axis=0))
    np.testing.assert_allclose(mean, [0.0, 0.0, 2.0], atol=0.2)


def test_wind_pushes_drone():
    """A constant x-wind drags a hovering quad downwind via body drag."""
    cfg = quadx.QuadXConfig(noisy_motors=False)
    params = quadx.build_params(cfg)
    state = quadx.init_state(params, cfg, jnp.asarray([0.0, 0.0, 5.0]), jnp.zeros(3))
    hover = float(np.sqrt(0.027 * 9.81 / 2.0))
    state = state.replace(setpoint=jnp.asarray([0.0, 0.0, 0.0, hover]))
    wind = ConstantWind(jnp.asarray([10.0, 0.0, 0.0]))

    def scan_fn(s, _):
        s, _ = quadx.step(s, params, cfg, 0, wind_fn=wind)
        return s, None

    state, _ = jax.lax.scan(scan_fn, state, None, length=240)
    assert float(state.body.pos[0]) > 0.01  # blown downwind
