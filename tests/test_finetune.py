"""Classifier / U²-Net fine-tune loops: losses drop, models learn the toy task."""

import numpy as np
import pytest


def _toy_classifier_data(n=32, size=96):
    """class 1 = bright square present, class 0 = dark noise."""
    rng = np.random.default_rng(0)
    crops = rng.integers(0, 60, size=(n, size, size, 3), dtype=np.uint8)
    labels = rng.integers(0, 2, size=n).astype(np.int32)
    for i in range(n):
        if labels[i] == 1:
            crops[i, 20:70, 20:70] = 230
    return crops, labels


def test_classifier_finetune_learns():
    from yolo_puncture_tpu.tasks import ClassifierNet
    from yolo_puncture_tpu.train.finetune import ClassifierFinetuner

    net = ClassifierNet("efficientnet_b0", input_size=96)
    crops, labels = _toy_classifier_data()
    ft = ClassifierFinetuner(net, lr=5e-4)
    loss, acc = ft.fit_arrays(crops, labels, epochs=12, batch_size=16, log_every=0)
    assert loss is not None and loss < 0.4, f"CE did not drop: {loss}"
    # the updated net predicts through the task API
    idx, p = net.predict(crops[:16])
    train_acc = (idx == labels[:16]).mean()
    assert train_acc >= 0.8, f"classifier did not fit the toy task: {train_acc}"


def test_unet_finetune_learns():
    from yolo_puncture_tpu.tasks import UNetPredictor
    from yolo_puncture_tpu.train.finetune import UNetFinetuner

    rng = np.random.default_rng(0)
    n, S = 16, 48
    images = rng.uniform(0, 0.2, size=(n, S, S, 3)).astype(np.float32)
    masks = np.zeros((n, S, S), np.float32)
    for i in range(n):
        x = int(rng.integers(4, 20))
        images[i, 10:34, x : x + 20] = 0.9
        masks[i, 10:34, x : x + 20] = 1.0

    pred = UNetPredictor("u2netp")
    ft = UNetFinetuner(pred, lr=3e-4)
    l0 = ft.fit_arrays(images, masks, epochs=1, batch_size=4, log_every=0)
    l1 = ft.fit_arrays(images, masks, epochs=6, batch_size=4, log_every=0)
    assert l1 < l0, f"U2Net loss did not drop: {l0} → {l1}"
    # thresholded prediction overlaps the bright bar
    bgr = (images[0][..., ::-1] * 255).astype(np.uint8)
    out = pred.predict(bgr)
    inter = ((out > 0) & (masks[0] > 0)).sum()
    union = ((out > 0) | (masks[0] > 0)).sum()
    assert union > 0 and inter / union > 0.3, f"U2Net IoU too low: {inter/union:.2f}"


def test_recalibrate_batch_stats_exact():
    """The two-pass solver recovers exact batch statistics for any momentum."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from yolo_puncture_tpu.train.finetune import recalibrate_batch_stats

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.BatchNorm(use_running_average=not train, momentum=0.93)(x)
            return nn.BatchNorm(use_running_average=not train, momentum=0.99)(x)

    m = M()
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 5)) * 3.0 + 2.0
    v = m.init(jax.random.PRNGKey(0), x)
    stats = recalibrate_batch_stats(m, v["params"], v["batch_stats"], [x])
    got_mean = np.asarray(stats["BatchNorm_0"]["mean"])
    got_var = np.asarray(stats["BatchNorm_0"]["var"])
    np.testing.assert_allclose(got_mean, np.asarray(x).mean(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_var, np.asarray(x).var(0), rtol=1e-3, atol=1e-4)
    # second layer (momentum 0.99) sees the first layer's normalized output
    xn = (np.asarray(x) - np.asarray(x).mean(0)) / np.sqrt(np.asarray(x).var(0) + 1e-5)
    np.testing.assert_allclose(
        np.asarray(stats["BatchNorm_1"]["mean"]), xn.mean(0), rtol=1e-3, atol=1e-5
    )


def test_load_cls_bbox_dataset(tmp_path):
    import cv2

    from yolo_puncture_tpu.train.finetune import ClassifierFinetuner, load_cls_bbox_dataset

    (tmp_path / "images" / "train").mkdir(parents=True)
    (tmp_path / "labels" / "train").mkdir(parents=True)
    img = np.zeros((64, 64, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "train" / "1frame_0.jpg"), img)
    (tmp_path / "labels" / "train" / "1frame_0.txt").write_text("1 0.5 0.5 0.4 0.3")
    items = load_cls_bbox_dataset(str(tmp_path), "train")
    assert len(items) == 1 and items[0][1] == 1
    crops, labels = ClassifierFinetuner.crops_from_dataset(str(tmp_path), "train", 48)
    assert crops.shape == (1, 48, 48, 3) and labels[0] == 1
