"""Functional NN primitives with PyTorch-compatible initialization.

Models in this framework are pure pytrees of arrays plus ``init_*``/``apply``
functions — the idiomatic JAX counterpart of the reference's ``nn.Module``
graph (reference ``src/models/vit_3d.py``). Initializers reproduce PyTorch
defaults so parity tests against the torch reference can start from
numerically comparable distributions:

- ``nn.Linear``: kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  for both weight and bias.
- ``nn.LayerNorm``: scale=1, bias=0, eps=1e-5.
- ViT ``pos_embedding`` / ``cls_token``: standard-normal (vit_3d.py:98-99).

Kernels are stored ``(in_features, out_features)`` so the forward pass is a
plain ``x @ W`` (row-major, MXU-friendly); torch stores the transpose.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

LN_EPS = 1e-5  # torch nn.LayerNorm default (vit_3d.py uses defaults)


def matmul_precision(dtype):
    """Default matmul precision truncates f32 operands to bf16 on TPU (and in
    this environment's CPU backend). For f32 activations request true-f32
    passes; bf16 activations keep the fast single-pass default."""
    return "highest" if dtype == jnp.float32 else None


# --------------------------------------------------------------------------
# Initializers
# --------------------------------------------------------------------------

def linear_init(key: jax.Array, in_features: int, out_features: int,
                use_bias: bool = True, dtype=jnp.float32) -> dict:
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / (in_features ** 0.5)
    params = {
        "kernel": jax.random.uniform(
            wkey, (in_features, out_features), dtype, -bound, bound)
    }
    if use_bias:
        params["bias"] = jax.random.uniform(
            bkey, (out_features,), dtype, -bound, bound)
    return params


def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


# --------------------------------------------------------------------------
# Forward primitives
# --------------------------------------------------------------------------

def linear(params: dict, x: jax.Array) -> jax.Array:
    """x @ W (+ b). Accumulates the matmul in f32 on the MXU regardless of
    the activation dtype (bf16 inputs, f32 accumulation)."""
    y = jnp.dot(x, params["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32,
                precision=matmul_precision(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(params: dict, x: jax.Array, eps: float = LN_EPS) -> jax.Array:
    """LayerNorm over the trailing dim, computed in f32 for stability."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU, matching torch nn.GELU default (vit_3d.py:20)."""
    return jax.nn.gelu(x, approximate=False)


def dropout(key: Optional[jax.Array], x: jax.Array, rate: float,
            deterministic: bool) -> jax.Array:
    """Inverted dropout, torch nn.Dropout semantics.

    Stays on the XLA path (the mask `where` fuses into producer epilogues and
    the saved mask makes the backward nearly free — measured faster end-to-end
    than the regenerate-in-backward Pallas kernel, scripts/dropout_bench.py),
    but draws uint8 random bits instead of bernoulli over f32 uniforms: RNG
    *bit volume* dominates dropout cost on TPU (profiled: uint8 masks cut the
    flagship train step by ~25 ms vs uint32, ~11% — BENCH.md). The keep
    probability is quantized to q/256 and the inverse scale uses the actual
    quantized keep, so E[dropout(x)] == x exactly; common rates (0.5, 0.25,
    0.125) are exact, others shift by <= 1/512 (e.g. 0.1 -> 0.1016), which is
    immaterial to regularization strength.
    """
    if deterministic or rate == 0.0:
        return x
    q = round((1.0 - rate) * 256.0)
    if not 0 < q < 256:
        # Degenerate quantization (rate < 1/512 or > 1 - 1/512): fall back to
        # exact bernoulli so tiny rates don't become no-ops.
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
    keep = q / 256.0
    bits = jax.random.bits(key, x.shape, dtype=jnp.uint8)
    return jnp.where(bits < jnp.uint8(q), x * (1.0 / keep), 0.0).astype(x.dtype)


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE with integer labels == torch nn.CrossEntropyLoss (Trainer.py:30)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - gold)
