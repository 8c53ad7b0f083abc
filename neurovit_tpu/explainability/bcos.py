"""B-cos-style inherent explanations (experimental).

The reference carries a 22-line torch.hub demo stub for B-cos networks
(``explainability/bcos/bcos.py`` — loads a pretrained 2D B-cos ResNet and
calls ``explain``; never integrated with the 3D models). Pretrained B-cos
hub weights are 2D-ImageNet models and don't transfer to 3D fMRI volumes, so
parity here is the *capability*: a dynamic-linear explanation for our own
models.

For a (locally) linear model view y = W(x) x, the contribution map is
W(x)^T e_c ∘ x — implemented exactly as input-gradient x input (the
dynamic-linear weights of a piecewise-linear/B-cos-style network):
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


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
