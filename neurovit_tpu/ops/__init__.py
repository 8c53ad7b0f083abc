"""Hot-path compute ops with dual implementations.

Every op has an ``xla`` implementation (pure jnp — reference semantics,
runs anywhere, used as the numerics golden) and a ``pallas`` implementation
(fused TPU kernel). ``resolve_impl`` picks the default per backend; configs
and tests can force either via KERNEL_IMPL.
"""

from __future__ import annotations

import jax


def resolve_impl(requested: str = "auto") -> str:
    """Map KERNEL_IMPL config ("auto" | "xla" | "pallas") to a concrete impl."""
    if requested in ("xla", "pallas"):
        return requested
    backend = jax.default_backend()
    return "pallas" if backend == "tpu" else "xla"


from neurovit_tpu.ops.attention import sdpa  # noqa: E402,F401
