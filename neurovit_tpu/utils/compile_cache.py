"""Persistent XLA compilation cache wiring.

The flagship train step takes ~20-40 s to compile on a TPU backend; every
process restart (training re-launch, a serving replica coming up, the
inference CLI) pays it again. JAX ships a disk-backed compilation cache that
makes recompiles of an unchanged program near-instant — this module turns it
on from the config surface.

The reference has no analog (PyTorch eager pays no compile; its
``torch.compile`` line is commented out, reference ``main.py:142``). Config:

    GLOBAL_COMPILE_CACHE: './results/jax_cache'   # '' disables

Enabled only on non-CPU backends by default: CPU compiles are milliseconds
and the tests' 8-device virtual meshes would only churn disk.
"""

from __future__ import annotations

import os

_ENABLED_DIR = None


def maybe_enable(config: dict) -> bool:
    """Enable the persistent compilation cache if configured. Idempotent;
    returns True when the cache is (already) active."""
    global _ENABLED_DIR
    cache_dir = config.get("GLOBAL_COMPILE_CACHE", "")
    if not cache_dir:
        return False
    if os.environ.get("NEUROVIT_COMPILE_CACHE", "1") == "0":
        return False

    import jax

    if jax.default_backend() == "cpu" and not os.environ.get(
            "NEUROVIT_COMPILE_CACHE_CPU"):
        return False
    cache_dir = os.path.join(config.get("GLOBAL_BASE_PATH", "."), cache_dir)
    if _ENABLED_DIR == cache_dir:
        return True
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took meaningful compile time; default threshold
    # (1 s) already skips trivial programs, keep it but make the floor
    # explicit so behavior doesn't drift with JAX versions.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _ENABLED_DIR = cache_dir
    return True
