"""NaN-guard utility tests (SURVEY §5: np.seterr intent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyflyt_tpu.utils.debug import assert_finite, checked


def test_checked_flags_nan():
    def bad(x):
        return jnp.log(x)  # log(0) -> -inf, log(-1) -> nan

    err, out = jax.jit(checked(bad))(jnp.asarray(-1.0))
    with pytest.raises(Exception):
        err.throw()


def test_checked_clean_step():
    from pyflyt_tpu.envs.quadx_hover import QuadXHoverEnv

    env = QuadXHoverEnv(noisy_motors=False)
    state, _ = env.reset(jax.random.PRNGKey(0))
    err, (state2, out) = jax.jit(checked(env.step))(
        state, jnp.asarray([0.0, 0.0, 0.0, 0.36])
    )
    err.throw()  # no error raised: the step is NaN-free
    assert np.isfinite(np.asarray(out.obs)).all()


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="a"):
        assert_finite({"a": jnp.asarray([1.0, jnp.nan])})
