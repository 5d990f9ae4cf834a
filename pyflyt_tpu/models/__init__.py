"""Vehicle models: dynamics + control cascades as pure batched functions."""

from pyflyt_tpu.models import quadx  # noqa: F401
