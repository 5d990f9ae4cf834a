"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``); the real TPU is reserved for
benchmarks (bench.py), not unit tests. The sandbox pre-imports jax with the
remote-TPU ("axon") platform via sitecustomize, so plain env vars are not
enough — we switch the platform through jax.config before any backend
initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402

# slow tier: interpret-mode kernel parity files (auto-marked kernel_parity;
# deselected by default via addopts in pyproject.toml — run them with
# `pytest -m kernel_parity tests/ -q`)
_KERNEL_PARITY_FILES = {
    "test_pallas_quadx.py",
    "test_pallas_fixedwing.py",
    "test_pallas_rocket.py",
    "test_pallas_dogfight.py",
    "test_selfplay_dogfight.py",
    "test_pallas_sgd.py",
    "test_packed_hover.py",
    "test_packed_waypoints.py",
    "test_packed_mod_hovering.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.path.name in _KERNEL_PARITY_FILES:
            item.add_marker(pytest.mark.kernel_parity)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop JAX's compiled-program caches at each module boundary.

    The suite compiles ~250 XLA:CPU programs, several of them huge
    (interpret-mode fused kernels, env resets with stabilization scans).
    With everything cached in one process, XLA:CPU's compiler segfaults
    deterministically around the ~228th program (observed 3x at
    test_rocket.py::test_env_reset_obs once the round-3 tests pushed the
    count past it; each file passes in isolation). Modules share almost no
    jitted functions, so per-module cache clearing costs little and keeps
    the compiler's accumulated state bounded.
    """
    yield
    jax.clear_caches()


@pytest.fixture
def interpret_pallas(monkeypatch):
    """Force pallas_call into interpret mode (CPU): the kernel parity test
    files opt in with ``pytestmark = pytest.mark.usefixtures(...)``. Real
    Mosaic lowering is exercised on hardware by bench.py / bench_suite.py.

    Every kernel in the package launches through
    pyflyt_tpu.ops.pallas_math.grid_call, which consults the module-level
    _FORCE_INTERPRET flag — flip it for the test instead of monkeypatching
    jax.experimental.pallas.pallas_call process-wide."""
    from pyflyt_tpu.ops import pallas_math

    monkeypatch.setattr(pallas_math, "_FORCE_INTERPRET", True)
