"""Core simulation machinery: math, state pytrees, integrator, wind."""

from pyflyt_tpu.core import math  # noqa: F401
