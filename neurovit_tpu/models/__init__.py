"""Model zoo: 3D ViT, 3D ResNet, 4D temporal head, top-level NeuroEncoder."""

from neurovit_tpu.models.neuro_encoder import NeuroEncoder  # noqa: F401
from neurovit_tpu.models.vit3d import ViTConfig  # noqa: F401
from neurovit_tpu.models.resnet3d import ResNetConfig  # noqa: F401
from neurovit_tpu.models.temporal import TemporalConfig  # noqa: F401
