"""Checkpointing: Orbax full train state + torch-style state-dict pickles.

The reference saves bare ``state_dict`` files twice per epoch — a rolling
``./results/last_model.pth`` and a timestamped ``model-e{epoch}.pth``
(``src/Trainer.py:54-56``) — with no optimizer/step state, so it cannot
resume (SURVEY §5.4). We keep that cadence and add what TPU production needs:

- **Orbax** checkpoints carrying params + model_state (BN stats) + opt_state
  + epoch + RNG → true mid-run resume,
- a parallel **state-dict pickle** per save (torch key names/layouts, see
  ``state_dict.py``) for reference-compatible weight exchange.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import orbax.checkpoint as ocp

from neurovit_tpu.training import state_dict as sd

LAST_MODEL_PATH = "./results/last_model.pkl"  # reference: ./results/last_model.pth


def _serializable(train_state: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(train_state)
    out["rng"] = jax.random.key_data(train_state["rng"])
    return out


_async_cp = None            # lazy singleton; one save in flight at a time


def save_train_state(path: str, train_state: Dict[str, Any], model, *,
                     asynchronous: bool = False) -> None:
    """Persist the full train state (+ the torch-style state-dict pickle).

    ``asynchronous=True`` uses Orbax's AsyncCheckpointer: the device->host
    copy happens BEFORE it returns (so the Trainer's donated step buffers
    can be reused immediately), and only the disk write overlaps the next
    epoch. Call :func:`wait_for_async_saves` before reading the checkpoint
    back or exiting the process.
    """
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if asynchronous:
        global _async_cp
        if _async_cp is None:
            _async_cp = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        _async_cp.wait_until_finished()
        _async_cp.save(path, args=ocp.args.StandardSave(
            _serializable(train_state)), force=True)
    else:
        with ocp.StandardCheckpointer() as cp:
            cp.save(path, _serializable(train_state), force=True)
    # The pickle is small and host-side; writing it synchronously keeps the
    # "MODEL SAVED" line truthful for the weight-exchange artifact.
    sd.save(path + ".state_dict.pkl",
            sd.to_state_dict(model, train_state["params"],
                             train_state.get("model_state")))


def wait_for_async_saves() -> None:
    """Block until any in-flight async checkpoint write has committed."""
    if _async_cp is not None:
        _async_cp.wait_until_finished()


def load_train_state(path: str, train_state_like: Dict[str, Any]
                     ) -> Dict[str, Any]:
    """Restore a full train state; `train_state_like` provides the pytree
    structure/shardings (a freshly initialized state)."""
    path = os.path.abspath(path)
    template = _serializable(train_state_like)
    with ocp.StandardCheckpointer() as cp:
        restored = cp.restore(path, template)
    # Re-place every leaf on the template's sharding (replicated / TP) so the
    # restored state composes with jitted steps on the mesh.
    restored = jax.tree.map(
        lambda t, r: jax.device_put(r, t.sharding) if hasattr(t, "sharding")
        else r, template, restored)
    restored["rng"] = jax.random.wrap_key_data(
        restored["rng"], impl=jax.random.key_impl(train_state_like["rng"]))
    return restored


def save_last_model(train_state: Dict[str, Any], model,
                    path: str = LAST_MODEL_PATH) -> None:
    """Rolling weights-only save (reference Trainer.py:54)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    sd.save(path, sd.to_state_dict(model, train_state["params"],
                                   train_state.get("model_state")))


def load_pretrained_volume_encoder(model, params: Dict[str, Any],
                                   checkpoint_path: str) -> Dict[str, Any]:
    """4D bootstrap: load a 3D-run checkpoint's ViT weights into the volume
    encoder with ``volume_encoder.vit3d.`` key filtering (NeuroEncoder.py:
    25-32; load is strict over the filtered subset)."""
    full = sd.load(checkpoint_path)
    return sd.load_into(
        model, params, full, strict=False,
        prefix_filter="volume_encoder.vit3d.")


def load_state_dict_file(model, params: Dict[str, Any], path: str,
                         strict: bool = False) -> Dict[str, Any]:
    """--inference weight load (reference main.py:163-170, strict=False).
    Params-only (ViT); resnet checkpoints carry BN running stats too — use
    ``load_variables_file``."""
    return sd.load_into(model, params, sd.load(path), strict=strict)


def load_variables_file(model, variables: Dict[str, Any], path: str,
                        strict: bool = False) -> Dict[str, Any]:
    """Weight load into full {"params", "state"} variables — works for both
    encoder kinds (resnet BN running stats land in the state subtree)."""
    return sd.load_into_variables(model, variables, sd.load(path),
                                  strict=strict)
