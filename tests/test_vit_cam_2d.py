"""2D ViT CAM tutorial (vit_cam_2d.py): the vendored pytorch_grad_cam ViT
tutorial's own workflow — 2D image, method menu, smoothing flags, jet
overlay — self-contained on the synthetic squares task."""

import dataclasses

import jax
import numpy as np
import pytest

from neurovit_tpu.explainability import cam_methods, vit_cam_2d
from neurovit_tpu.explainability.vit_cam_2d import (
    IMAGE_SIZE, SQUARE_SIZE, ViT2D, compute_cam_2d, finalize_cam_2d,
    make_squares, show_cam_on_image, train_demo_model)

METHODS_2D = [m for m in cam_methods.METHODS if m != "gradcam-ref"]


@pytest.fixture(scope="module")
def untrained():
    model = ViT2D()
    return model, model.init(jax.random.key(0))


def test_make_squares_labels_match_positions():
    images, labels = make_squares(jax.random.key(7), 16)
    cells = IMAGE_SIZE // SQUARE_SIZE
    assert images.shape == (16, IMAGE_SIZE, IMAGE_SIZE)
    assert set(np.unique(labels)).issubset(range(cells * cells))
    for img, label in zip(images, labels):
        y = label // cells * SQUARE_SIZE
        x = label % cells * SQUARE_SIZE
        square = img[y:y + SQUARE_SIZE, x:x + SQUARE_SIZE]
        assert (square == 1.0).all()
        # exactly one square of ones; background stays below it
        assert (img == 1.0).sum() == SQUARE_SIZE ** 2


def test_every_method_shape_and_range(untrained):
    model, variables = untrained
    image, _ = make_squares(jax.random.key(1), 1)
    for method in METHODS_2D:
        cam, class_idx = compute_cam_2d(model, variables, image[0],
                                        method=method, threshold=20.0)
        assert cam.shape == (IMAGE_SIZE, IMAGE_SIZE)
        assert np.isfinite(cam).all()
        assert 0.0 <= cam.min() and cam.max() <= 1.0 + 1e-6
        # top-20% of the 14x14 grid kept; bilinear upsampling smears the
        # cell edges, so the pixel-space nonzero fraction lands above 0.2
        # but the threshold must still visibly sparsify the map
        assert (cam > 0).mean() < 0.7
        assert int(np.asarray(class_idx).ravel()[0]) in range(
            model.vit_cfg.num_classes)


def test_smoothing_flags(untrained):
    """aug_smooth/eigen_smooth produce valid maps that differ from plain."""
    model, variables = untrained
    image, _ = make_squares(jax.random.key(2), 1)
    plain, _ = compute_cam_2d(model, variables, image[0], method="gradcam")
    for kwargs in ({"aug_smooth": True}, {"eigen_smooth": True}):
        cam, _ = compute_cam_2d(model, variables, image[0], method="gradcam",
                                **kwargs)
        assert cam.shape == plain.shape
        assert np.isfinite(cam).all()
        assert not np.allclose(cam, plain)


def test_gradcam_ref_rejected(untrained):
    model, variables = untrained
    image, _ = make_squares(jax.random.key(3), 1)
    with pytest.raises(ValueError, match="method must be one of"):
        compute_cam_2d(model, variables, image[0], method="gradcam-ref")


def test_batched_matches_per_sample(untrained):
    model, variables = untrained
    images, _ = make_squares(jax.random.key(4), 2)
    cam_b, idx_b = compute_cam_2d(model, variables, images,
                                  method="gradcam", threshold=20.0)
    assert cam_b.shape == (2, IMAGE_SIZE, IMAGE_SIZE)
    for i in range(2):
        cam_1, idx_1 = compute_cam_2d(model, variables, images[i],
                                      method="gradcam", threshold=20.0)
        assert int(idx_b[i]) == int(idx_1[0])
        np.testing.assert_allclose(cam_b[i], cam_1, rtol=1e-4, atol=1e-5)


def test_finalize_cam_2d_threshold_sparsity():
    cam = jax.numpy.asarray(np.random.default_rng(0).normal(size=(1, 14, 14)))
    out = np.asarray(finalize_cam_2d(cam, 56, 20.0))
    assert out.shape == (1, 56, 56)
    assert 0.0 <= out.min() and out.max() <= 1.0 + 1e-6
    # top-20% percentile keeps the 14x14 grid sparse pre-upsample
    assert (np.asarray(finalize_cam_2d(cam, 14, 20.0)) > 0).mean() < 0.3


def test_show_cam_on_image_contract():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(size=(56, 56, 3)).astype(np.float32)
    cam = rng.uniform(size=(56, 56)).astype(np.float32)
    out = show_cam_on_image(rgb, cam)
    assert out.shape == (56, 56, 3)
    assert out.dtype == np.uint8
    assert out.max() == 255  # normalized by the max, upstream semantics


@pytest.mark.slow
def test_trained_demo_localizes_and_cli(tmp_path):
    """The demo model learns the squares task and the CAM localizes the
    square (the tutorial's visual QA, automated as in the 3D tests)."""
    model = ViT2D()
    variables = train_demo_model(model, steps=300, verbose=False)
    images, labels = make_squares(jax.random.key(123), 8)

    correct = 0
    for method in ("layercam", "scorecam"):
        hits = 0
        for i in range(8):
            cam, idx = compute_cam_2d(model, variables, images[i],
                                      method=method, threshold=20.0)
            square = images[i] == 1.0
            hits += cam[square].mean() > cam[~square].mean()
            if method == "layercam":
                correct += int(idx[0]) == labels[i]
        assert hits >= 5, f"{method} localization weak: {hits}/8"
    assert correct >= 7, f"demo model failed to learn: {correct}/8"

    # CLI end-to-end (reuses nothing from above: own training run)
    out = vit_cam_2d.main(["--method", "layercam", "--steps", "200",
                           "--output-dir", str(tmp_path)])
    assert (tmp_path / "layercam_cam.png").exists()
    assert out.endswith("layercam_cam.png")
