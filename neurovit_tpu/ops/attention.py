"""Scaled-dot-product multi-head attention.

Replaces the reference's materialized softmax(QK^T)V attention
(``src/models/vit_3d.py:48-60``: batched matmul -> softmax -> dropout ->
batched matmul) with:

- ``xla`` impl: same dense math via jnp (golden / CPU path),
- ``pallas`` impl: a flash-attention TPU kernel (online softmax, never
  materializes the N x N score matrix in HBM) with a custom VJP — see
  ``neurovit_tpu.ops.flash_attention``.

Layout is [B, H, N, D] throughout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array, *,
         scale: float,
         dropout_rate: float = 0.0,
         dropout_rng: Optional[jax.Array] = None,
         deterministic: bool = True,
         impl: str = "xla",
         n_valid: Optional[int] = None) -> jax.Array:
    """softmax(q k^T * scale) v over [B, H, N, D] tensors.

    Attention-probability dropout matches the reference's
    ``self.dropout(attn)`` (vit_3d.py:56-57). ``n_valid`` masks trailing
    (padding) key positions for pre-padded token streams.
    """
    if impl == "pallas":
        from neurovit_tpu.ops.flash_attention import flash_attention
        return flash_attention(
            q, k, v, scale=scale,
            dropout_rate=0.0 if deterministic else dropout_rate,
            dropout_rng=dropout_rng, n_valid=n_valid)
    return _sdpa_xla(q, k, v, scale=scale, dropout_rate=dropout_rate,
                     dropout_rng=dropout_rng, deterministic=deterministic)


def _sdpa_xla(q, k, v, *, scale, dropout_rate, dropout_rng, deterministic):
    from neurovit_tpu.nn import matmul_precision
    prec = matmul_precision(q.dtype)
    dots = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=jnp.float32,
                      precision=prec) * scale
    attn = jax.nn.softmax(dots, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_rng, keep, attn.shape)
        attn = jnp.where(mask, attn / keep, 0.0)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(q.dtype), v,
                     preferred_element_type=jnp.float32, precision=prec)
    return out.astype(q.dtype)
