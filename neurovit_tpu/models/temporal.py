"""Temporal transformer + projection head for 4D fMRI mode.

Re-implements the reference's 4D head (``src/models/NeuroEncoder.py:207-230``):
one ``nn.TransformerEncoderLayer(d_model=2, nhead=2, batch_first=True)`` layer
(PyTorch defaults: **post-LN**, ReLU FFN of width 2048, dropout 0.1, biased
in/out projections, eps 1e-5) followed by ``nn.Linear(2, 2)``.

Note the reference quirk (SURVEY §2.1.7): in 4D mode the frozen ViT3D feeds
its 2-dim *logits* into this transformer, so d_model == num_classes == 2.
``d_model`` is a parameter here so the head also works with real latent
widths.

PyTorch-matched initialization:
- in-proj weight: xavier-uniform, in-proj bias: zeros,
- out-proj: Linear default weight, zero bias,
- FFN linears: Linear defaults
(torch ``nn.MultiheadAttention._reset_parameters`` /
``nn.TransformerEncoderLayer``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from neurovit_tpu import nn
from neurovit_tpu.ops.attention import sdpa


@dataclasses.dataclass(frozen=True)
class TemporalConfig:
    d_model: int = 2
    nhead: int = 2
    dim_feedforward: int = 2048   # torch TransformerEncoderLayer default
    num_layers: int = 1           # NeuroEncoder.py:212
    dropout: float = 0.1          # torch default
    impl: str = "xla"


def _xavier_uniform(key, shape, dtype):
    fan_in, fan_out = shape[0], shape[1]
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init(key: jax.Array, cfg: TemporalConfig, dtype=jnp.float32) -> dict:
    layers = []
    for lkey in jax.random.split(key, cfg.num_layers):
        k_in, k_out, k_fc1, k_fc2 = jax.random.split(lkey, 4)
        d = cfg.d_model
        out_proj = nn.linear_init(k_out, d, d, dtype=dtype)
        out_proj["bias"] = jnp.zeros((d,), dtype)
        layers.append({
            "in_proj": {
                "kernel": _xavier_uniform(k_in, (d, 3 * d), dtype),
                "bias": jnp.zeros((3 * d,), dtype),
            },
            "out_proj": out_proj,
            "norm1": nn.layer_norm_init(d, dtype),
            "norm2": nn.layer_norm_init(d, dtype),
            "fc1": nn.linear_init(k_fc1, d, cfg.dim_feedforward, dtype=dtype),
            "fc2": nn.linear_init(k_fc2, cfg.dim_feedforward, d, dtype=dtype),
        })
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers) \
        if cfg.num_layers > 1 else {"layer0": layers[0]}


def _layer_apply(layer: dict, x: jax.Array, cfg: TemporalConfig, *,
                 deterministic: bool, rng: Optional[jax.Array]) -> jax.Array:
    """Post-LN encoder layer: x = LN(x + MHSA(x)); x = LN(x + FFN(x))."""
    b, t, d = x.shape
    head_dim = d // cfg.nhead
    rngs = jax.random.split(rng, 4) if rng is not None else (None,) * 4

    qkv = nn.linear(layer["in_proj"], x).reshape(b, t, 3, cfg.nhead, head_dim)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
    attn = sdpa(q, k, v, scale=head_dim ** -0.5,
                dropout_rate=cfg.dropout, dropout_rng=rngs[0],
                deterministic=deterministic, impl=cfg.impl)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, d)
    attn = nn.linear(layer["out_proj"], attn)
    x = nn.layer_norm(layer["norm1"],
                      x + nn.dropout(rngs[1], attn, cfg.dropout, deterministic))

    h = jax.nn.relu(nn.linear(layer["fc1"], x))
    h = nn.dropout(rngs[2], h, cfg.dropout, deterministic)
    h = nn.linear(layer["fc2"], h)
    x = nn.layer_norm(layer["norm2"],
                      x + nn.dropout(rngs[3], h, cfg.dropout, deterministic))
    return x


def apply(params: dict, x: jax.Array, cfg: TemporalConfig, *,
          deterministic: bool = True, rng: Optional[jax.Array] = None) -> jax.Array:
    """[B, T, d_model] -> [B, T, d_model]."""
    if cfg.num_layers == 1:
        return _layer_apply(params["layer0"], x, cfg,
                            deterministic=deterministic, rng=rng)
    rngs = (jax.random.split(rng, cfg.num_layers) if rng is not None else None)

    def body(carry, layer_and_rng):
        layer, lrng = layer_and_rng
        return _layer_apply(layer, carry, cfg, deterministic=deterministic,
                            rng=lrng if rngs is not None else None), None

    xs = (params, rngs if rngs is not None
          else jnp.zeros((cfg.num_layers, 2), dtype=jnp.uint32))
    out, _ = jax.lax.scan(body, x, xs)
    return out


def init_projection_head(key: jax.Array, d_in: int = 2, d_out: int = 2,
                         dtype=jnp.float32) -> dict:
    """nn.Linear(2, 2) projection head (NeuroEncoder.py:219-230)."""
    return nn.linear_init(key, d_in, d_out, dtype=dtype)
