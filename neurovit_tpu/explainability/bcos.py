"""B-cos networks and their inherent (dynamic-linear) explanations.

The reference carries a 22-line torch.hub demo stub for B-cos networks
(``explainability/bcos/bcos.py`` — loads a pretrained 2D B-cos ResNet and
calls ``explain``; never integrated with the 3D models). Pretrained B-cos
hub weights are 2D-ImageNet models and don't transfer to 3D fMRI volumes,
so this module provides the capability itself, two ways:

1. **Real B-cos layers** (Böhle et al., "B-cos Networks: Alignment is All
   We Need for Interpretability", CVPR 2022): the B-cos transform scales
   each unit's linear response by its input-weight alignment,
   ``out_j = |cos(x, w_j)|^(B-1) · (x · ŵ_j)`` with unit-norm rows ŵ and
   no biases. A stack of such layers is EXACTLY dynamic-linear —
   ``f(x) = W(x) x`` holds with equality — so the contribution map
   ``W(x)^T e_c ∘ x`` sums to the logit (completeness is an identity, not
   an approximation; pinned in tests). ``init_bcos_mlp``/``bcos_mlp_apply``
   build bias-free B-cos classifiers over volumes or encoder features, and
   ``explain_exact`` returns their exact contribution maps.

2. **Dynamic-linear explanation for the stock models** (``explain``):
   grad x input — the same map, exact for bias-free B-cos stacks and the
   standard local-linearization view for our ViT/ResNet.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# B-cos layers (bias-free, unit-norm rows, |cos|^(B-1) alignment scaling)
# --------------------------------------------------------------------------

_EPS = 1e-12


def bcos_linear_init(key: jax.Array, in_dim: int, out_dim: int,
                     dtype=jnp.float32) -> Dict:
    """Weight-only init (no bias — biases would break exact dynamic
    linearity). Rows are normalized at apply time, so any init scale works;
    kaiming-uniform keeps parity with our other linears."""
    bound = (1.0 / in_dim) ** 0.5
    return {"kernel": jax.random.uniform(key, (in_dim, out_dim), dtype,
                                         -bound, bound)}


def bcos_linear(params: Dict, x: jax.Array, b: float = 2.0,
                frozen_scale: bool = False) -> jax.Array:
    """out_j = |cos(x, w_j)|^(B-1) * (x . w_hat_j).

    B=1 reduces to a plain linear map with unit-norm rows; larger B
    suppresses poorly-aligned units, creating the alignment pressure that
    makes the learned W(x) itself interpretable.

    ``frozen_scale`` stops gradients through the alignment scales — the
    layer then IS the linear map ``diag(s(x)) W_hat^T`` of the
    dynamic-linear view (same forward value; used by ``explain_exact``).
    """
    w = params["kernel"]
    w_hat = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + _EPS)
    lin = x @ w_hat                                     # (x . w_hat_j)
    x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True) + _EPS
    scale = jnp.abs(lin / x_norm) ** (b - 1.0)
    if frozen_scale:
        scale = jax.lax.stop_gradient(scale)
    return scale * lin


def init_bcos_mlp(key: jax.Array, dims: Sequence[int],
                  dtype=jnp.float32) -> list:
    """Bias-free B-cos stack: dims = [in, hidden..., out]."""
    keys = jax.random.split(key, len(dims) - 1)
    return [bcos_linear_init(k, d_in, d_out, dtype)
            for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])]


def bcos_mlp_apply(params: list, x: jax.Array, b: float = 2.0,
                   frozen_scale: bool = False) -> jax.Array:
    """f(x) = W(x) x exactly: every layer is out = (diag(scale) W_hat^T) x,
    a linear map whose matrix depends on x only through the alignment
    scales — no bias, no activation needed (|cos|^(B-1) is itself the
    nonlinearity)."""
    h = x.reshape(x.shape[0], -1) if x.ndim > 2 else x
    for layer in params:
        h = bcos_linear(layer, h, b=b, frozen_scale=frozen_scale)
    return h


def explain_exact(params: list, x: jax.Array, b: float = 2.0,
                  class_idx=None) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact dynamic-linear contribution map of a B-cos stack.

    For f(x) = W(x) x, contributions are [W(x)^T e_c] ∘ x. W(x)^T e_c is
    the gradient of the FROZEN-SCALE forward (the forward value is
    unchanged; gradients just don't flow through the alignment scales), so
    no hooks and no Jacobian materialization are needed. Because the
    frozen-scale model is linear in x with no bias, completeness
    ``sum(contrib) == f_c(x)`` holds as an identity (tested), unlike
    grad x input on biased/piecewise-linear nets.

    Returns (contributions shaped like x, class_idx, logits).
    """
    x2d = x.reshape(x.shape[0], -1) if x.ndim > 2 else x
    logits = bcos_mlp_apply(params, x2d, b=b)
    if class_idx is None:
        class_idx = jnp.argmax(logits, axis=1)

    def frozen_score(inp):
        lg = bcos_mlp_apply(params, inp, b=b, frozen_scale=True)
        return jnp.sum(jnp.take_along_axis(lg, class_idx[:, None], axis=1))

    grads = jax.grad(frozen_score)(x2d)
    contrib = (grads * x2d).reshape(x.shape)
    return contrib, class_idx, logits


@partial(jax.jit, static_argnums=(0,))
def _explain_jit(model, params: Dict, x: jax.Array):
    logits, _ = model.apply(params, x, deterministic=True)
    class_idx = jnp.argmax(logits, axis=1)

    def score(inp):
        lg, _ = model.apply(params, inp, deterministic=True)
        return jnp.sum(jnp.take_along_axis(lg, class_idx[:, None], axis=1))

    grads = jax.grad(score)(x)
    return grads * x, class_idx


def explain(model, variables: Dict, x) -> Tuple[np.ndarray, np.ndarray]:
    """Dynamic-linear contribution map (grad x input) for the argmax class.

    x: [H,W,D] or [B,H,W,D] -> (contributions like x, class_idx).
    """
    params = variables["params"] if "params" in variables else variables
    x = jnp.asarray(x, jnp.float32)
    squeeze = x.ndim == model.config["TRAINING_DIM"]
    if squeeze:
        x = x[None]
    contrib, cls = _explain_jit(model, params, x)
    contrib = np.asarray(contrib)
    return (contrib[0] if squeeze else contrib), np.asarray(cls)
