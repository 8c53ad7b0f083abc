"""Batched inference serving for trained NeuroEncoder checkpoints.

The reference's only inference path is the ``--inference`` evaluation sweep
(``src/Trainer.py:120-166``). For production serving this module provides a
``Predictor``: loads a checkpoint once, compiles a fixed-batch forward, and
serves arbitrary request sizes by slicing/padding into the compiled shape —
one XLA program, no recompiles, amortized MXU utilization.

    predictor = Predictor.from_checkpoint(config, "best_model.pkl")
    labels, probs = predictor(volumes)          # [N, H, W, D] -> [N], [N, C]
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neurovit_tpu.models.neuro_encoder import NeuroEncoder


class Predictor:
    """Fixed-batch compiled predictor; pass ``mesh`` to serve data-parallel
    over multiple chips (params replicated, request batch sharded over the
    mesh ``data`` axis — throughput scales with the chip count; validated on
    the virtual 8-device mesh in tests/test_serving.py)."""

    def __init__(self, model: NeuroEncoder, variables: Dict[str, Any],
                 batch_size: int = 32, mesh=None):
        self.model = model
        self.variables = variables
        self.batch_size = batch_size
        self.mesh = mesh
        if mesh is not None:
            from neurovit_tpu.parallel.mesh import DATA_AXIS
            from neurovit_tpu.parallel.sharding import replicated
            if batch_size % mesh.shape[DATA_AXIS] != 0:
                raise ValueError(
                    f"batch_size {batch_size} must divide over the mesh "
                    f"{DATA_AXIS} axis ({mesh.shape[DATA_AXIS]})")
            # Replicate in place: extra entries a caller passed alongside
            # params/state survive untouched.
            rep = replicated(mesh)
            self.variables = {
                **variables,
                "params": jax.device_put(variables["params"], rep),
                "state": jax.device_put(variables["state"], rep),
            }

        def forward(params, state, volumes):
            logits, _ = model.apply(params, volumes, state=state,
                                    deterministic=True)
            return jax.nn.softmax(logits, axis=-1)

        self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(cls, config: Dict[str, Any], checkpoint_path: str,
                        batch_size: int = 32,
                        seed: Optional[int] = None,
                        mesh=None) -> "Predictor":
        """Build from a torch-style state-dict pickle (the Trainer's
        per-epoch / last-model saves)."""
        from neurovit_tpu.training import checkpoint as ckpt
        model = NeuroEncoder(config)
        variables = model.init(
            jax.random.key(seed if seed is not None
                           else config.get("TRAINING_SEED", 42)))
        variables = ckpt.load_variables_file(model, variables,
                                             checkpoint_path, strict=False)
        return cls(model, variables, batch_size, mesh=mesh)

    def __call__(self, volumes: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """volumes: [N, H, W, D] (3D) or [N, H, W, D, T] (4D) ->
        (predicted labels [N], class probabilities [N, num_classes]).

        Requests of any N are served through the fixed compiled batch: full
        chunks stream through; the remainder is padded (and discarded)."""
        volumes = np.asarray(volumes, np.float32)
        n = volumes.shape[0]
        bs = self.batch_size
        probs_out = np.empty((n, self.model.num_classes), np.float32)
        for start in range(0, n, bs):
            chunk = volumes[start:start + bs]
            real = chunk.shape[0]
            if real < bs:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], bs - real, axis=0)])
            if self.mesh is not None:
                from neurovit_tpu.parallel.sharding import batch_sharding
                device_chunk = jax.device_put(chunk,
                                              batch_sharding(self.mesh))
            else:
                device_chunk = jnp.asarray(chunk)
            probs = self._forward(self.variables["params"],
                                  self.variables["state"],
                                  device_chunk)
            probs_out[start:start + real] = np.asarray(probs)[:real]
        return probs_out.argmax(axis=1), probs_out

    def warmup(self) -> None:
        """Compile ahead of the first request."""
        shape = ((self.batch_size,)
                 + (self.model.config["TRAINING_VIT_INPUT_SIZE"],) * 3)
        if self.model.is_4d:
            shape = shape + (1,)
        self(np.zeros(shape, np.float32))
