"""Training actually learns: overfit a single synthetic image, loss must drop."""

import numpy as np
import pytest


@pytest.mark.slow
def test_overfit_single_image_loss_decreases():
    from yolo_puncture_tpu import create_model
    from yolo_puncture_tpu.train.trainer import Trainer

    S, M, B = 64, 4, 2
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(1, S, S, 3)).astype(np.float32)
    images = np.repeat(img, B, axis=0)
    gt_masks = np.zeros((B, M, S // 4, S // 4), np.float32)
    gt_masks[:, 0, 4:10, 4:10] = 1.0
    batch = {
        "images": images,
        "gt_labels": np.zeros((B, M), np.int32),
        "gt_bboxes": np.tile(np.array([16.0, 16, 40, 40], np.float32), (B, M, 1)),
        "mask_gt": np.tile(np.array([True] + [False] * (M - 1)), (B, 1)),
        "gt_masks": gt_masks,
    }

    model = create_model("yolov8n-seg", nc=1)
    tr = Trainer(
        model, nc=1, imgsz=S, lr0=0.01, total_steps=40, warmup_steps=5, use_ema=False
    )
    state = tr.init_state(batch)
    losses = []
    for _ in range(30):
        state, metrics = tr.train_step(state, batch)
        losses.append(float(metrics["total"]))
    # robust decrease check: mean of last 5 well below mean of first 5
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(last)
    assert last < 0.7 * first, f"loss did not decrease: {first:.2f} → {last:.2f}"


@pytest.mark.slow
@pytest.mark.parametrize("model_name", ["yolov8n-seg", "yolo10n-seg"])
def test_train_to_detect_emerges(model_name):
    """300 steps from random init on synthetic bars → real detections with
    IoU > 0.5 via the public predict API (train↔predict integration; pins the
    ultralytics per-GT topk gating bootstrap AND the v10 consistent
    dual-assignment + NMS-free one-to-one inference path)."""
    from yolo_puncture_tpu import create_model
    from yolo_puncture_tpu.predict import YOLO
    from yolo_puncture_tpu.train.metrics import box_iou_np
    from yolo_puncture_tpu.train.trainer import Trainer

    S, M, B = 64, 4, 4
    rng = np.random.default_rng(0)

    def make_batch():
        imgs = np.zeros((B, S, S, 3), np.float32)
        boxes = np.zeros((B, M, 4), np.float32)
        masks = np.zeros((B, M, S // 4, S // 4), np.float32)
        mask_gt = np.zeros((B, M), bool)
        for b in range(B):
            x1 = rng.integers(2, 16)
            y1 = rng.integers(14, 28)
            w = rng.integers(32, 46)
            h = rng.integers(16, 28)
            x2, y2 = min(S, x1 + w), min(S, y1 + h)
            imgs[b, y1:y2, x1:x2] = 1.0
            boxes[b, 0] = (x1, y1, x2, y2)
            masks[b, 0, y1 // 4 : y2 // 4, x1 // 4 : x2 // 4] = 1
            mask_gt[b, 0] = True
        return {
            "images": imgs, "gt_labels": np.zeros((B, M), np.int32),
            "gt_bboxes": boxes, "mask_gt": mask_gt, "gt_masks": masks,
        }

    model = create_model(model_name, nc=1)
    tr = Trainer(model, nc=1, imgsz=S, lr0=0.01, total_steps=400, warmup_steps=20,
                 use_ema=False)
    state = tr.init_state(make_batch())
    for _ in range(300):
        state, _ = tr.train_step(state, make_batch())

    det = YOLO(model_name, nc=1)
    det.variables = {"params": state.params, "batch_stats": state.batch_stats}
    tb = make_batch()
    hits = 0
    for b in range(B):
        img_bgr = (tb["images"][b][..., ::-1] * 255).astype(np.uint8)
        r = det.predict(source=img_bgr, conf=0.25, imgsz=S, retina_masks=True)[0]
        if len(r.boxes):
            iou = float(box_iou_np(r.boxes.xyxy[:1], tb["gt_bboxes"][b][:1])[0, 0])
            if iou > 0.5:
                hits += 1
    assert hits >= 3, f"only {hits}/4 synthetic objects detected after training"


def test_classifier_timm_key_conversion():
    """Synthetic timm-style EfficientNet keys land in the right flax leaves."""
    import jax
    import jax.numpy as jnp

    from yolo_puncture_tpu import create_model
    from yolo_puncture_tpu.utils.torch_convert import convert_classifier_state_dict

    model = create_model("efficientnet_b0", num_classes=2)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)

    k = template["params"]["conv_stem"]["kernel"]  # (3, 3, 3, 32)
    fc = template["params"]["classifier"]["kernel"]  # (1280, 2)
    sd = {
        "conv_stem.weight": np.ones((k.shape[3], k.shape[2], 3, 3), np.float32) * 2,
        "bn1.weight": np.full((k.shape[3],), 3.0, np.float32),
        "bn1.running_var": np.full((k.shape[3],), 4.0, np.float32),
        "classifier.weight": np.ones((2, fc.shape[0]), np.float32) * 5,
        "classifier.bias": np.array([1.0, 2.0], np.float32),
    }
    # blocks key in torch layout (O, I, kh, kw)
    pw = np.asarray(template["params"]["blocks_1_0"]["conv_pw"]["kernel"])  # (1,1,I,O)
    sd["blocks.1.0.conv_pw.weight"] = np.ones((pw.shape[3], pw.shape[2], 1, 1), np.float32) * 7

    variables, report = convert_classifier_state_dict(sd, template)
    assert not report["unmatched_torch_keys"], report["unmatched_torch_keys"]
    np.testing.assert_allclose(np.asarray(variables["params"]["conv_stem"]["kernel"]), 2.0)
    np.testing.assert_allclose(np.asarray(variables["params"]["bn1"]["scale"]), 3.0)
    np.testing.assert_allclose(np.asarray(variables["batch_stats"]["bn1"]["var"]), 4.0)
    np.testing.assert_allclose(np.asarray(variables["params"]["classifier"]["kernel"]), 5.0)
    np.testing.assert_allclose(
        np.asarray(variables["params"]["blocks_1_0"]["conv_pw"]["kernel"]), 7.0
    )
