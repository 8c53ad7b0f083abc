"""Optimizer chain: LR schedules, masking, accumulation interop."""

import jax
import jax.numpy as jnp
import numpy as np

from neurovit_tpu.training.optim import build_optimizer


def _params():
    return {"a": {"kernel": jnp.ones((4, 4))}, "b": {"bias": jnp.ones(4)}}


def _mask(trainable_b=True):
    return {"a": {"kernel": True}, "b": {"bias": trainable_b}}


def _grads():
    return {"a": {"kernel": jnp.full((4, 4), 0.1)}, "b": {"bias": jnp.full(4, 0.1)}}


def _config(**kw):
    return {"TRAINING_LEARNING_RATE": 0.01, "TRAINING_WEIGHT_DECAY": 0.0,
            "TRAINING_EPOCHS": 2, "TRAINING_ACCUMULATION_STEP": 1, **kw}


def test_constant_lr_reported():
    tx, lr_fn = build_optimizer(_config(), _mask(), steps_per_epoch=10)
    state = tx.init(_params())
    assert abs(lr_fn(state) - 0.01) < 1e-9


def test_cosine_schedule_decays():
    tx, lr_fn = build_optimizer(_config(TRAINING_LR_SCHEDULE="cosine"),
                                _mask(), steps_per_epoch=5)
    params = _params()
    state = tx.init(params)
    lrs = []
    for _ in range(10):
        updates, state = tx.update(_grads(), state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        lrs.append(lr_fn(state))
    assert lrs[-1] < lrs[0] * 0.05      # near-fully decayed at the end


def test_plateau_set_lr_roundtrip():
    tx, lr_fn = build_optimizer(_config(TRAINING_LR_SCHEDULE="plateau"),
                                _mask(), steps_per_epoch=5)
    state = tx.init(_params())
    state = lr_fn.set_lr(state, 0.005)
    assert abs(lr_fn(state) - 0.005) < 1e-9
    # Updated state still drives updates.
    updates, state = tx.update(_grads(), state, _params())
    assert np.isfinite(np.asarray(updates["a"]["kernel"])).all()


def test_mask_freezes_and_skips_decay():
    config = _config(TRAINING_WEIGHT_DECAY=0.5)
    tx, _ = build_optimizer(config, _mask(trainable_b=False),
                            steps_per_epoch=5)
    params = _params()
    state = tx.init(params)
    updates, _ = tx.update(_grads(), state, params)
    # frozen subtree gets exactly zero update (no grad step, no decay)
    np.testing.assert_array_equal(np.asarray(updates["b"]["bias"]), 0.0)
    assert np.abs(np.asarray(updates["a"]["kernel"])).max() > 0


def test_accumulation_with_schedule():
    tx, lr_fn = build_optimizer(
        _config(TRAINING_ACCUMULATION_STEP=2, TRAINING_LR_SCHEDULE="plateau"),
        _mask(), steps_per_epoch=4)
    params = _params()
    state = tx.init(params)
    updates, state = tx.update(_grads(), state, params)   # micro-step 1
    np.testing.assert_array_equal(np.asarray(updates["a"]["kernel"]), 0.0)
    updates, state = tx.update(_grads(), state, params)   # applies
    assert np.abs(np.asarray(updates["a"]["kernel"])).max() > 0
    state = lr_fn.set_lr(state, 0.001)                    # nested navigation
    assert abs(lr_fn(state) - 0.001) < 1e-9
