"""Multi-host (pod-slice) runtime initialization.

The reference has no distributed backend at all (single ``cuda:{N}`` string,
``main.py:41-46``); the single-host multi-chip story here is pure SPMD over a
``Mesh`` (mesh.py). This module adds the remaining §5.8 layer: multi-HOST
pods, where each process owns a subset of the chips and JAX needs a
coordination service before any backend use.

Usage: ``maybe_initialize(config)`` as the first JAX-touching call (main.py
does this). It is a no-op unless multi-host is requested — explicitly via
``DISTRIBUTED_MULTIHOST: true`` or implicitly by the standard coordinator
env vars — so single-host runs (this box, CI, tests) are untouched.

Per-host batch semantics on multi-host: each process feeds its LOCAL batch;
``global_batch`` assembles the jax.Array spanning all hosts from the
process-local shard. The loader/Trainer stay unchanged — on one host
process_count()==1 makes it exactly device_put.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax

_COORD_ENVS = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")


def multihost_requested(config: Dict[str, Any] | None = None) -> bool:
    if config and config.get("DISTRIBUTED_MULTIHOST", False):
        return True
    return any(os.environ.get(k) for k in _COORD_ENVS)


def maybe_initialize(config: Dict[str, Any] | None = None) -> bool:
    """jax.distributed.initialize() when a multi-host run is requested.

    Returns True when the distributed runtime was initialized (or already
    was). Arguments come from the standard env vars (TPU pods auto-detect:
    coordinator, process id, and count come from the TPU metadata server) or
    the DISTRIBUTED_* config keys when set.
    """
    if not multihost_requested(config):
        return False
    kwargs = {}
    if config:
        for ckey, kwarg in (("DISTRIBUTED_COORDINATOR", "coordinator_address"),
                            ("DISTRIBUTED_NUM_PROCESSES", "num_processes"),
                            ("DISTRIBUTED_PROCESS_ID", "process_id")):
            if config.get(ckey) is not None:
                kwargs[kwarg] = config[ckey]
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
    return True


def global_batch(host_batch, mesh) -> Any:
    """Assemble a global batch-dim-sharded jax.Array from this process's
    local batch. Single-process: plain device_put with the batch sharding
    (what shard_batch does). Multi-process: each host contributes its local
    rows; the result spans the whole mesh without any host gathering the
    global batch.
    """
    from neurovit_tpu.parallel.sharding import batch_sharding
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(host_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, host_batch)


def local_rows(arr) -> Any:
    """This process's rows of a batch-dim-sharded global array, as numpy.

    The inverse of :func:`global_batch` for per-sample outputs (e.g. eval
    predictions): on a multi-process mesh the global array is not fully
    addressable, so ``np.asarray`` raises — instead concatenate the
    addressable shards in batch-index order, which are exactly the rows
    this process contributed (DP sharding keeps row i on its source
    device). Fully-addressable arrays pass straight through."""
    import numpy as np
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])
