"""NeuroViT-TPU: a TPU-native JAX/Pallas framework for 3D/4D neuroimaging
classification with Vision Transformers.

A ground-up, TPU-first rebuild of the capabilities of gillet-thomas/NeuroViT
(reference mounted read-only at /root/reference):

- 3D Vision Transformer, 3D ResNet and 4D temporal-transformer models as pure
  functional JAX pytrees (reference: ``src/models/``),
- fused Pallas TPU kernels for the hot path (flash attention, LayerNorm+MLP,
  patch embedding),
- data-parallel (and optional tensor-parallel) training over a
  ``jax.sharding.Mesh`` via jit + NamedSharding,
- the reference's config surface (UPPERCASE YAML keys, CLI flags), trainer
  behavior (logging cadence, checkpoint cadence), dataset semantics (ADNI
  3D/4D, Pain, synthetic Grad-CAM cubes) and G3D-ViT Grad-CAM explainability.

Public entry points:
    neurovit_tpu.config.load_config     -- YAML config loading + runtime keys
    neurovit_tpu.models.NeuroEncoder    -- top-level model (3D/4D mode select)
    neurovit_tpu.training.Trainer       -- training / validation / eval loops
    neurovit_tpu.data.get_datasets      -- dataset dispatch by DATASET_NAME
"""

__version__ = "0.1.0"
