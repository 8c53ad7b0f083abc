"""Device mesh + sharding: the framework's communication layer.

The reference is single-GPU (no torch.distributed anywhere, SURVEY §5.8); the
TPU-native equivalent of "one big GPU" is SPMD over a ``jax.sharding.Mesh``:
batch data-parallelism over the ``data`` axis (gradients reduced by XLA
``psum`` over ICI) plus optional tensor-parallelism of attention heads / MLP
hidden over the ``model`` axis.
"""

from neurovit_tpu.parallel.mesh import (  # noqa: F401
    create_mesh, DATA_AXIS, MODEL_AXIS, PIPE_AXIS,
)
from neurovit_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding, replicated, shard_batch, param_shardings,
)
from neurovit_tpu.parallel.pipeline import pipeline_blocks  # noqa: F401
from neurovit_tpu.parallel import distributed  # noqa: F401
