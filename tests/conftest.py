"""Test environment: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding tests run on fake CPU devices
(--xla_force_host_platform_device_count=8), per SURVEY §4: multi-chip tests
must be runnable without TPU hardware.
"""

import os
import sys

# Make the repo root importable when pytest runs from anywhere.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Env-var JAX_PLATFORMS is overridden by this machine's TPU site hook, so
# force the CPU backend via config (must precede backend initialization).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


def _tiny_overrides(tmp_path):
    from neurovit_tpu.config import load_config
    # NB: patch must NOT tile the cube exactly — the patch-LayerNorm
    # (vit_3d.py:93 semantics) maps spatially-uniform patches to pure bias,
    # destroying the signal. 20/5 vs cube 8 keeps mixed boundary patches
    # (like the reference's real 90/9-vs-8 configs).
    return load_config(overrides={
        "TRAINING_VIT_INPUT_SIZE": 20,
        "TRAINING_VIT_PATCH_SIZE": 5,
        "GRADCAM_CUBE_SIZE": 8,
        "GRADCAM_NUM_SAMPLES": 64,
        "GRADCAM_TRAIN_PATH": str(tmp_path / "gradcam_train.pkl"),
        "GRADCAM_VAL_PATH": str(tmp_path / "gradcam_val.pkl"),
        "DATASET_NAME": "gradcam",
        "TRAINING_BATCH_SIZE": 8,
        "TRAINING_EPOCHS": 1,
        "TRAINING_NUM_WORKERS": 2,
        "TRAINING_DROPOUT": 0.0,
        "TRAINING_PRECISION": "f32",
        "MODEL_VIT_DIM": 64,
        "MODEL_VIT_DEPTH": 2,
        "MODEL_VIT_HEADS": 4,
        "MODEL_VIT_DIM_HEAD": 16,
        "MODEL_VIT_MLP_DIM": 128,
        "KERNEL_IMPL": "xla",
        "GLOBAL_OUTPUT_DIR": str(tmp_path / "runs"),
        "WANDB_ENABLED": False,
    })


@pytest.fixture
def tiny_config(tmp_path):
    """Small config that exercises the full stack on CPU quickly."""
    return _tiny_overrides(tmp_path)


@pytest.fixture(scope="module")
def tiny_config_module(tmp_path_factory):
    """Module-scoped tiny_config: share one dataset/model across a module's
    read-only tests (each module gets its own tmp dir)."""
    return _tiny_overrides(tmp_path_factory.mktemp("tiny"))
