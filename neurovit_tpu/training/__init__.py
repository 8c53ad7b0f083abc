"""Training layer: Trainer, checkpointing, metrics, sweeps."""

from neurovit_tpu.training.trainer import Trainer  # noqa: F401
from neurovit_tpu.training.metrics import MetricLogger  # noqa: F401
