"""G3D-ViT Grad-CAM plotting/export driver.

Re-implements ``explainability/xAi_gradcam_ViT3D/gradcam3DViT_fmris.py``:
per-sample CAM + slice extraction, the combined jet-overlay grid PNG
(gradcam3DViT_fmris.py:34-67), and optional per-sample 3D scatter + NIfTI
export (gradcam3DViT_fmris.py:69-94). Runs as a module:

    python -m neurovit_tpu.explainability.driver [--config ...]
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Dict, List, Sequence

import numpy as np

from neurovit_tpu.data import nifti


def get_sample_gradcam(model, variables, dataset, sample_id: int,
                       config: Dict, save_sample_attention: bool = False):
    sample = dataset.sample(sample_id)
    volume = sample["volume"]
    print(f"ID: {sample_id} - Label: {sample['subject']}")
    method = config.get("GRADCAM_METHOD", "gradcam-ref")
    if method != "gradcam-ref":
        # The tutorial's CAM-method menu (gradcam_original.py:59-68), native
        # on the 3D ViT probe layer.
        from neurovit_tpu.explainability.cam_methods import compute_cam
        attention_map, class_idx = compute_cam(model, variables, volume,
                                               method=method)
    else:
        attention_map, class_idx = model.get_attention_map(variables, volume)
    img, attn = model.visualize_slice(attention_map, volume)
    if save_sample_attention:
        save_gradcam_3d(attention_map, sample_id, sample, config)
    return sample_id, img, attn, int(np.asarray(class_idx).ravel()[0]), sample


def create_gradcam_plot(model, variables, dataset, ids: Sequence[int],
                        config: Dict, save_sample_attention: bool = False
                        ) -> str:
    """Combined 4-column jet-overlay grid across samples; returns PNG path."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    results = [get_sample_gradcam(model, variables, dataset, i, config,
                                  save_sample_attention) for i in ids]
    n = len(results)
    cols = 4
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(20, 5 * rows))
    fig.suptitle(f"ADNI GradCAM Results "
                 f"{config['TRAINING_VIT_PATCH_SIZE']}patch", fontsize=16)
    axes = np.atleast_2d(axes)
    for idx, (sid, image, attention, class_idx, _) in enumerate(results):
        ax = axes[idx // cols, idx % cols]
        # Inverse brightness on dark backgrounds (gradcam3DViT_fmris.py:51).
        shown = (-image + 1 if config["GRADCAM_BACKGROUND_NOISE"] < 1
                 else image)
        ax.imshow(shown, cmap="gray")
        heatmap = ax.imshow(attention, cmap="jet", alpha=0.4)
        fig.colorbar(heatmap, ax=ax, fraction=0.046, pad=0.04)
        ax.set_title(f"Subject {sid} (Class {class_idx})")
        ax.axis("off")
    for idx in range(n, rows * cols):
        axes[idx // cols, idx % cols].axis("off")

    out_dir = config["GRADCAM_OUTPUT_DIR"]
    os.makedirs(out_dir, exist_ok=True)
    file_name = (f"ADNI_{config['TRAINING_VIT_PATCH_SIZE']}patch_results_"
                 f"{datetime.now().strftime('%Y%m%d_%H%M%S')}").replace(".", "p")
    path = os.path.join(out_dir, f"{file_name}.png")
    plt.tight_layout()
    plt.savefig(path, dpi=150)
    plt.close()
    print(f"All results saved to {file_name}.png")
    return path


def save_gradcam_3d(attention_map, sample_id: int, sample: Dict,
                    config: Dict) -> None:
    """3D scatter of above-threshold attention + NIfTI export
    (gradcam3DViT_fmris.py:69-94)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    attention_map = np.asarray(attention_map)
    threshold = config["GRADCAM_THRESHOLD_3D"]
    coords = np.argwhere(attention_map > threshold)
    values = attention_map[attention_map > threshold]

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")
    if coords.size > 0:
        sc = ax.scatter(coords[:, 0], coords[:, 1], coords[:, 2], c=values,
                        cmap="jet", marker="s", alpha=0.6, s=50)
        fig.colorbar(sc, ax=ax, shrink=0.5, aspect=10, label="Attention Value")
    else:
        print(f"No attention values above threshold {threshold} "
              f"for sample {sample_id}")
    ax.set(xlim=(0, attention_map.shape[0]), ylim=(0, attention_map.shape[1]),
           zlim=(0, attention_map.shape[2]))
    ax.set(xlabel="X axis", ylabel="Y axis", zlabel="Z axis")

    out_dir = config["GRADCAM_OUTPUT_DIR"]
    os.makedirs(out_dir, exist_ok=True)
    file_name = (f"ADNI_{config['TRAINING_VIT_PATCH_SIZE']}patch_"
                 f"3Dattention_{sample_id}").replace(".", "p")
    plt.title(f"3D GradCAM (Label: {sample['subject']})")
    plt.tight_layout()
    plt.savefig(os.path.join(out_dir, f"{file_name}.png"), dpi=150)
    plt.close()
    nifti.save(os.path.join(out_dir, f"{file_name}.nii"), attention_map)


def main(argv: List[str] = None) -> None:
    import jax

    from neurovit_tpu.config import get_config, parse_args
    from neurovit_tpu.data import get_datasets
    from neurovit_tpu.models import NeuroEncoder
    from neurovit_tpu.training import checkpoint as ckpt

    args = parse_args(argv)
    config = get_config(args)
    model = NeuroEncoder(config)
    variables = model.init(jax.random.key(config["TRAINING_SEED"]))
    best = os.path.join(config["GLOBAL_BASE_PATH"], config["BEST_MODEL_PATH"])
    if os.path.exists(best):
        variables = ckpt.load_variables_file(model, variables, best,
                                             strict=False)
    _, dataset = get_datasets(config)
    ids = list(range(12))
    create_gradcam_plot(model, variables, dataset, ids, config,
                        save_sample_attention=config["GRADCAM_SAVE_ATTENTION"])


if __name__ == "__main__":
    main()
