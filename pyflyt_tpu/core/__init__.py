"""Core simulation machinery: math, state pytrees, integrator, wind, aviary."""

from pyflyt_tpu.core import math  # noqa: F401
from pyflyt_tpu.core.aviary import Aviary, AviaryState, DroneSpec, register_drone_type  # noqa: F401
from pyflyt_tpu.core.load_objs import boxes_from_mesh, loadOBJ, merge_boxes  # noqa: F401
