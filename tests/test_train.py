"""Training stack: assigner, losses, one optimization step, metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_puncture_tpu.train.assigner import bbox_ciou, task_aligned_assign
from yolo_puncture_tpu.train.losses import detection_loss
from yolo_puncture_tpu.train.metrics import box_iou_np, compute_map, mask_iou_np


def test_ciou_identity_and_disjoint():
    a = jnp.array([[0.0, 0, 10, 10]])
    assert float(bbox_ciou(a, a)[0]) == pytest.approx(1.0, abs=1e-6)
    b = jnp.array([[100.0, 100, 110, 110]])
    assert float(bbox_ciou(a, b)[0]) < 0  # disjoint + center distance penalty


def test_assigner_assigns_center_anchor():
    # one gt box covering anchors around (32, 32); the best-scoring anchor inside wins
    A = 64
    anc = jnp.stack(
        jnp.meshgrid(jnp.arange(8) * 8 + 4.0, jnp.arange(8) * 8 + 4.0), -1
    ).reshape(-1, 2)
    scores = jnp.full((1, A, 1), 0.3)
    boxes = jnp.tile(jnp.array([24.0, 24, 40, 40]), (1, A, 1))
    gt_labels = jnp.zeros((1, 2), jnp.int32)
    gt_boxes = jnp.array([[[24.0, 24, 40, 40], [0, 0, 0, 0]]])
    mask_gt = jnp.array([[True, False]])
    out = task_aligned_assign(scores, boxes, anc, gt_labels, gt_boxes, mask_gt, topk=4)
    fg = np.asarray(out["fg_mask"][0])
    assert fg.sum() > 0
    # all assigned anchors lie inside the gt box
    pos = np.asarray(anc)[fg]
    assert (pos >= 24).all() and (pos <= 40).all()
    # padded gt never assigned
    assert (np.asarray(out["target_gt_idx"][0])[fg] == 0).all()
    ts = np.asarray(out["target_scores"][0])
    assert ts.max() > 0 and ts.min() >= 0


def _tiny_batch(S=64, M=4, B=2):
    rng = np.random.default_rng(0)
    gt_masks = np.zeros((B, M, S // 4, S // 4), np.float32)
    gt_masks[:, 0, 4:10, 4:10] = 1.0
    return {
        "images": rng.uniform(size=(B, S, S, 3)).astype(np.float32),
        "gt_labels": np.zeros((B, M), np.int32),
        "gt_bboxes": np.tile(np.array([16.0, 16, 40, 40], np.float32), (B, M, 1))
        * np.array([1, 1, 1, 1], np.float32),
        "mask_gt": np.tile(np.array([True] + [False] * (M - 1)), (B, 1)),
        "gt_masks": gt_masks,
    }


@pytest.mark.parametrize("name", ["yolov8n-seg", "yolo10n-seg"])
def test_detection_loss_finite_and_positive(name):
    from yolo_puncture_tpu import create_model

    model = create_model(name, nc=1)
    batch = _tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["images"]))
    out = model.apply(variables, jnp.asarray(batch["images"]), train=True,
                      mutable=["batch_stats"])[0]
    total, losses = detection_loss(out, jax.tree.map(jnp.asarray, batch), nc=1)
    assert np.isfinite(float(total)) and float(total) > 0
    for k in ("box", "cls", "dfl", "seg"):
        assert k in losses and np.isfinite(float(losses[k]))
    if name.startswith("yolo10"):
        assert "o2o_cls" in losses


def test_one_train_step_reduces_loss_or_runs():
    from yolo_puncture_tpu import create_model
    from yolo_puncture_tpu.train.trainer import Trainer

    model = create_model("yolov8n-seg", nc=1)
    tr = Trainer(model, nc=1, imgsz=64, lr0=0.005, total_steps=10, warmup_steps=0)
    batch = _tiny_batch()
    state = tr.init_state(batch)
    # snapshot BEFORE train_step: the step donates its input state buffers
    before = np.concatenate([np.ravel(np.asarray(x)) for x in jax.tree.leaves(state.params)])
    state1, m1 = tr.train_step(state, batch)
    state2, m2 = tr.train_step(state1, batch)
    assert int(state2.step) == 2
    assert np.isfinite(float(m2["total"]))
    # params actually changed (a dropped apply_updates would keep them equal)
    after = np.concatenate([np.ravel(np.asarray(x)) for x in jax.tree.leaves(state2.params)])
    assert np.abs(before - after).max() > 0
    assert float(m1["lr"]) >= 0


def test_map_perfect_predictions():
    gt = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]]),
           "classes": np.array([0, 0])}]
    pred = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 40, 40]]),
             "scores": np.array([0.9, 0.8]), "classes": np.array([0, 0])}]
    m = compute_map(pred, gt)
    assert m["map50"] == pytest.approx(1.0, abs=0.01)
    assert m["map50_95"] == pytest.approx(1.0, abs=0.01)


def test_map_half_matched():
    gt = [{"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]]),
           "classes": np.array([0, 0])}]
    pred = [{"boxes": np.array([[0, 0, 10, 10]]),
             "scores": np.array([0.9]), "classes": np.array([0])}]
    m = compute_map(pred, gt)
    # ultralytics-style interp with (1.0, 0.0) sentinel gives 0.75 here (not COCO 0.5)
    assert 0.5 <= m["map50"] <= 0.8


def test_mask_iou():
    a = np.zeros((1, 8, 8)); a[0, :4] = 1
    b = np.zeros((2, 8, 8)); b[0, :4] = 1; b[1, 4:] = 1
    iou = mask_iou_np(a, b)
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[0, 1] == 0.0


def test_seg_dataset_roundtrip(tmp_path):
    import cv2
    from yolo_puncture_tpu.train.data import SegDataset

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    img = np.zeros((100, 200, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "a.jpg"), img)
    # polygon: normalized rectangle
    (tmp_path / "labels" / "a.txt").write_text("0 0.25 0.25 0.75 0.25 0.75 0.75 0.25 0.75\n")
    ds = SegDataset(str(tmp_path), split="train", imgsz=64, max_boxes=4, augment=False)
    assert len(ds) == 1
    item = ds.load(0)
    assert item["images"].shape == (64, 64, 3)
    assert item["mask_gt"][0] and not item["mask_gt"][1]
    x1, y1, x2, y2 = item["gt_bboxes"][0]
    assert 0 < x1 < x2 <= 64 and 0 < y1 < y2 <= 64
    assert item["gt_masks"][0].sum() > 0
    batches = list(ds.batches(1, shuffle=False))
    assert batches[0]["images"].shape == (1, 64, 64, 3)


def test_quantize_for_transfer_guards_range():
    """uint8-over-the-wire quantization: in-range [0,1] floats round to the
    /255 grid; out-of-range (standardized) images ship unquantized instead of
    silently wrapping; masks round rather than truncate (ADVICE r4)."""
    from yolo_puncture_tpu.train.trainer import Trainer

    grid = (np.arange(256, dtype=np.float32) / 255.0).reshape(16, 16)
    out = Trainer._quantize_for_transfer({"images": grid})
    assert out["images"].dtype == np.uint8
    np.testing.assert_array_equal(out["images"], np.arange(256).reshape(16, 16))

    standardized = grid * 4.0 - 2.0  # values in [-2, 2]
    out = Trainer._quantize_for_transfer({"images": standardized})
    assert out["images"].dtype == np.float32  # shipped as-is, no wrap

    masks = np.array([[0.0, 0.999, 1.0, 0.001]], np.float32)
    out = Trainer._quantize_for_transfer({"gt_masks": masks})
    assert out["gt_masks"].dtype == np.uint8
    np.testing.assert_array_equal(out["gt_masks"], [[0, 1, 1, 0]])
