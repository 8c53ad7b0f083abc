"""Optimizer construction: masked AdamW + optional LR schedules.

The reference uses constant-LR AdamW (``src/Trainer.py:31``) and carries two
commented-out schedulers — ``ReduceLROnPlateau(patience=1, factor=0.5)`` and
``CosineAnnealingLR`` (``src/Trainer.py:32-33``). Here all three are
functional via ``TRAINING_LR_SCHEDULE`` ∈ {constant, cosine, plateau}:

- constant: the reference's active path,
- cosine: optax cosine decay over the full training run,
- plateau: LR is a mutable hyperparameter (optax.inject_hyperparams);
  the Trainer halves it when val_loss fails to improve for
  ``TRAINING_PLATEAU_PATIENCE`` epochs (reference's commented settings).

The chain is inject_hyperparams(adamw) -> masked (frozen params are neither
updated nor decayed) -> MultiSteps (gradient accumulation).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import optax


def build_optimizer(config: Dict[str, Any], mask, steps_per_epoch: int
                    ) -> Tuple[optax.GradientTransformation, Callable]:
    """Returns (tx, current_lr_fn(opt_state) -> float)."""
    lr = config["TRAINING_LEARNING_RATE"]
    wd = config.get("TRAINING_WEIGHT_DECAY", 0.01)
    schedule = config.get("TRAINING_LR_SCHEDULE", "constant")
    accum = max(1, int(config.get("TRAINING_ACCUMULATION_STEP", 1)))
    epochs = config.get("TRAINING_EPOCHS", 1)

    if schedule == "cosine":
        # optimizer steps = micro-batches / accumulation
        decay_steps = max(1, epochs * steps_per_epoch // accum)
        lr_spec: Any = optax.cosine_decay_schedule(lr, decay_steps, alpha=0.0)
    else:  # constant or plateau start from the configured LR
        lr_spec = lr

    inner = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr_spec, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    # optax.masked passes raw gradients through for unmasked leaves, so
    # freezing needs an explicit zero on the complement (else frozen params
    # would receive bare-gradient updates if their grads were ever nonzero).
    import jax
    inv_mask = jax.tree.map(lambda m: not m, mask)
    tx: optax.GradientTransformation = optax.chain(
        optax.masked(inner, mask),
        optax.masked(optax.set_to_zero(), inv_mask))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)

    def _inject_state(opt_state):
        state = opt_state
        if accum > 1:
            state = state.inner_opt_state      # MultiStepsState
        return state[0].inner_state            # chain[0] Masked -> InjectHyperparams

    def current_lr(opt_state) -> float:
        return float(_inject_state(opt_state).hyperparams["learning_rate"])

    def set_lr(opt_state, new_lr):
        """Functional LR override (plateau schedule)."""
        import jax.numpy as jnp
        inj = _inject_state(opt_state)
        hyper = dict(inj.hyperparams)
        hyper["learning_rate"] = jnp.asarray(
            new_lr, dtype=jnp.asarray(hyper["learning_rate"]).dtype)
        new_inj = inj._replace(hyperparams=hyper)
        chain_state = opt_state.inner_opt_state if accum > 1 else opt_state
        new_chain = (chain_state[0]._replace(inner_state=new_inj),
                     ) + tuple(chain_state[1:])
        if accum > 1:
            return opt_state._replace(inner_opt_state=new_chain)
        return new_chain

    current_lr.set_lr = set_lr  # piggyback for the Trainer
    return tx, current_lr
