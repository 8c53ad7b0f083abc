"""Data layer: dataset dispatch + host pipeline.

``get_datasets`` mirrors the reference's dispatch on DATASET_NAME
(``main.py:91-114``) over adni / adni4D / pain / gradcam, fixing the
reference's PainDataset signature crash (SURVEY §2.1.4).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

from neurovit_tpu.data.loader import DataLoader  # noqa: F401
from neurovit_tpu.data.synthetic import GradCAMDataset  # noqa: F401


def get_datasets(config: Dict[str, Any]) -> Tuple[Any, Any]:
    name = config["DATASET_NAME"]
    if name == "gradcam":
        train = GradCAMDataset(config, mode="train",
                               generate_data=config["DATASET_GENERATE"])
        val = GradCAMDataset(config, mode="val", generate_data=False)
    elif name == "adni":
        from neurovit_tpu.data.adni import ADNIDataset
        train = ADNIDataset(config, mode="train",
                            generate_data=config["DATASET_GENERATE"])
        val = ADNIDataset(config, mode="val", generate_data=False)
    elif name == "adni4D":
        from neurovit_tpu.data.adni4d import ADNIDataset4D
        train = ADNIDataset4D(config, mode="train",
                              generate_data=config["DATASET_GENERATE"])
        val = ADNIDataset4D(config, mode="val", generate_data=False)
    elif name == "pain":
        from neurovit_tpu.data.pain import PainDataset
        train = PainDataset(config, mode="train",
                            generate_data=config["DATASET_GENERATE"])
        val = PainDataset(config, mode="val", generate_data=False)
    else:
        raise ValueError(f"Unknown DATASET_NAME: {name}")
    return train, val
