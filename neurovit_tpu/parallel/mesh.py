"""Mesh construction over the available TPU devices."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(config: Optional[Dict[str, Any]] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 2D (data, model) mesh.

    MESH_DATA_AXIS == -1 (default) puts all devices on the data axis with
    model=1 (pure DP, the idiomatic mapping of the reference's single-GPU
    training); setting MESH_MODEL_AXIS > 1 carves out a tensor-parallel axis.
    The data axis is outermost so gradient all-reduces ride contiguous ICI
    neighborhoods.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = int(config.get("MESH_MODEL_AXIS", 1)) if config else 1
    data = int(config.get("MESH_DATA_AXIS", -1)) if config else -1
    if model < 1 or n % model != 0:
        raise ValueError(f"MESH_MODEL_AXIS={model} does not divide {n} devices")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))
