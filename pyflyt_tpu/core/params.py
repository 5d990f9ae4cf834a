"""Vehicle parameter loading from the bundled YAML asset files."""

from __future__ import annotations

import copy
import functools
import os
from typing import Any

import yaml

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")


@functools.lru_cache(maxsize=None)
def _load_yaml_cached(path: str) -> Any:
    with open(path, "rb") as f:
        return yaml.safe_load(f)


def load_vehicle_yaml(name: str, model_dir: str | None = None) -> dict:
    """Loads ``<model_dir>/<name>.yaml`` (defaults to the bundled assets).

    Returns a deep copy so callers can tweak nested parameter sections
    without poisoning the process-wide cache.
    """
    directory = model_dir or os.path.join(ASSET_DIR, "vehicles")
    return copy.deepcopy(_load_yaml_cached(os.path.join(directory, f"{name}.yaml")))
