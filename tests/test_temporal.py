"""Temporal transformer parity vs torch nn.TransformerEncoderLayer."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from neurovit_tpu.models import temporal


def _copy_torch_layer(tlayer, d):
    """Map a torch TransformerEncoderLayer's weights into our pytree."""
    sd = {k: v.detach().numpy() for k, v in tlayer.state_dict().items()}
    return {"layer0": {
        "in_proj": {"kernel": sd["self_attn.in_proj_weight"].T,
                    "bias": sd["self_attn.in_proj_bias"]},
        "out_proj": {"kernel": sd["self_attn.out_proj.weight"].T,
                     "bias": sd["self_attn.out_proj.bias"]},
        "fc1": {"kernel": sd["linear1.weight"].T, "bias": sd["linear1.bias"]},
        "fc2": {"kernel": sd["linear2.weight"].T, "bias": sd["linear2.bias"]},
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
    }}


def test_temporal_matches_torch_encoder_layer():
    torch.manual_seed(0)
    d, nhead = 8, 2
    tlayer = torch.nn.TransformerEncoderLayer(
        d_model=d, nhead=nhead, batch_first=True).eval()
    cfg = temporal.TemporalConfig(d_model=d, nhead=nhead, num_layers=1)
    params = _copy_torch_layer(tlayer, d)

    x = np.random.RandomState(0).randn(3, 10, d).astype(np.float32)
    ours = temporal.apply(params, jnp.asarray(x), cfg, deterministic=True)
    with torch.no_grad():
        theirs = tlayer(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_temporal_d2_reference_shape():
    """The reference's exact configuration: d_model=2, nhead=2, 1 layer
    (NeuroEncoder.py:211-212) over T=140 timepoints."""
    cfg = temporal.TemporalConfig(d_model=2, nhead=2, num_layers=1)
    params = temporal.init(jax.random.key(0), cfg)
    x = jnp.zeros((2, 140, 2))
    y = temporal.apply(params, x, cfg, deterministic=True)
    assert y.shape == (2, 140, 2)
