"""Integrated Gradients for volume classifiers.

Replaces the reference's captum IntegratedGradients scripts
(``explainability/xAi_captum_Resnet3D/captum_IntegratedGradients.py`` and
``captum_IntegratedGradients2.py`` — both flagged "not working"/"not
accurate" in ``explainability/README.md:4-5``; this implementation is the
standard Riemann-sum IG and is tested for the completeness axiom).

IG(x) = (x - baseline) * mean_{a in (0,1]} dF_c(baseline + a (x-baseline))/dx
computed with a ``lax.scan`` over interpolation steps (single compiled
program, device-resident accumulation).

Baseline caveat: the 3D ViT LayerNorms each input patch (vit_3d.py:93), so
the network is nearly scale-invariant in x — with a zero baseline the path
F(a x) is constant for a > 0 and completeness cannot hold numerically (this
plausibly explains the reference's "IG not working / not accurate" verdicts,
explainability/README.md:4-5). Use a non-degenerate baseline (e.g. another
volume or noise) for meaningful attributions; the default remains zeros for
API familiarity.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(0, 4))
def _ig_jit(model, params: Dict, x: jax.Array, baseline: jax.Array,
            steps: int):
    logits, _ = model.apply(params, x, deterministic=True)
    class_idx = jnp.argmax(logits, axis=1)

    def target_score(inp):
        lg, _ = model.apply(params, inp, deterministic=True)
        return jnp.sum(jnp.take_along_axis(lg, class_idx[:, None], axis=1))

    delta = x - baseline

    def body(acc, i):
        # midpoint rule: alpha = (i+0.5)/steps (lower bias than left/right
        # Riemann at equal step count)
        alpha = (i.astype(jnp.float32) + 0.5) / steps
        grads = jax.grad(target_score)(baseline + alpha * delta)
        return acc + grads, None

    total, _ = jax.lax.scan(body, jnp.zeros_like(x), jnp.arange(steps))
    attributions = delta * total / steps
    return attributions, class_idx, logits


def integrated_gradients(model, variables: Dict, x, *,
                         baseline: Optional[np.ndarray] = None,
                         steps: int = 32) -> Tuple[np.ndarray, np.ndarray]:
    """x: [H,W,D] or [B,H,W,D] -> (attributions like x, class_idx [B])."""
    params = variables["params"] if "params" in variables else variables
    x = jnp.asarray(x, jnp.float32)
    squeeze = x.ndim == model.config["TRAINING_DIM"]
    if squeeze:
        x = x[None]
    base = (jnp.zeros_like(x) if baseline is None
            else jnp.broadcast_to(jnp.asarray(baseline, jnp.float32), x.shape))
    attr, cls, _ = _ig_jit(model, params, x, base, steps)
    attr = np.asarray(attr)
    return (attr[0] if squeeze else attr), np.asarray(cls)


def completeness_gap(model, variables: Dict, x, *, steps: int = 64,
                     baseline: Optional[np.ndarray] = None) -> float:
    """Relative completeness error |sum(IG) - (F_c(x) - F_c(b))| / |...| —
    the IG sanity metric (should -> 0 with step count; see the baseline
    caveat in the module docstring)."""
    params = variables["params"] if "params" in variables else variables
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == model.config["TRAINING_DIM"]:
        x = x[None]
    base = (jnp.zeros_like(x) if baseline is None
            else jnp.broadcast_to(jnp.asarray(baseline, jnp.float32),
                                  x.shape))
    attr, cls, logits = _ig_jit(model, params, x, base, steps)
    base_logits, _ = model.apply(params, base, deterministic=True)
    f_x = np.take_along_axis(np.asarray(logits), np.asarray(cls)[:, None], 1)
    f_b = np.take_along_axis(np.asarray(base_logits), np.asarray(cls)[:, None], 1)
    diff = (f_x - f_b).sum()
    return float(np.abs(np.asarray(attr).sum() - diff) / (np.abs(diff) + 1e-8))
