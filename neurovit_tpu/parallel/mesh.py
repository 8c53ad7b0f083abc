"""Mesh construction over the available TPU devices."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def create_mesh(config: Optional[Dict[str, Any]] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model, pipe) mesh.

    MESH_DATA_AXIS == -1 (default) puts all remaining devices on the data
    axis (pure DP, the idiomatic mapping of the reference's single-GPU
    training); MESH_MODEL_AXIS > 1 carves out a tensor-parallel axis and
    MESH_PIPE_AXIS > 1 a pipeline axis (parallel/pipeline.py). The data
    axis is outermost so gradient all-reduces ride contiguous ICI
    neighborhoods; pipe is innermost so stage hops are nearest-neighbor.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = int(config.get("MESH_MODEL_AXIS", 1)) if config else 1
    pipe = int(config.get("MESH_PIPE_AXIS", 1)) if config else 1
    data = int(config.get("MESH_DATA_AXIS", -1)) if config else -1
    if model < 1 or pipe < 1 or n % (model * pipe) != 0:
        raise ValueError(f"MESH_MODEL_AXIS={model} x MESH_PIPE_AXIS={pipe} "
                         f"does not divide {n} devices")
    if data == -1:
        data = n // (model * pipe)
    if data * model * pipe != n:
        raise ValueError(f"mesh {data}x{model}x{pipe} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model, pipe)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS, PIPE_AXIS))
