"""Numerical-safety instrumentation.

The reference trains with ``np.seterr(all="raise")`` + torch anomaly
detection (rl_training/hovering/training.py:45-46) so numerical blowups fail
loudly. The jit-compatible equivalents here:

- :func:`checked` wraps a pure step function with ``jax.experimental.checkify``
  float checks (NaN/Inf/div-by-zero) — run it on a repro input to locate the
  first bad op.
- :func:`assert_finite` is a cheap in-graph guard for training loops: raises
  on the host at the next sync point when any leaf goes non-finite.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def checked(fn: Callable) -> Callable:
    """Returns ``fn`` instrumented with float error checks.

    The wrapped function returns ``(error, output)``; call
    ``error.throw()`` to raise with the offending primitive's location.
    """
    from jax.experimental import checkify

    return checkify.checkify(fn, errors=checkify.float_checks)


def assert_finite(tree: Any, name: str = "pytree") -> None:
    """Host-side finite check over every leaf (sync point)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
