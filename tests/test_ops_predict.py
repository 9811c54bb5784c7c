"""Letterbox / NMS / mask-decode op tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_puncture_tpu.ops.letterbox import letterbox, letterbox_params, scale_boxes
from yolo_puncture_tpu.ops.masks import crop_masks, decode_masks
from yolo_puncture_tpu.ops.nms import batched_nms, box_iou_xyxy, v10_topk_select


def test_letterbox_params_match_ultralytics_formula():
    # 1080x1920 → 640: r = 1/3, new = (640, 360), pad top/bottom 140
    r, (nw, nh), (left, top) = letterbox_params(1080, 1920, 640)
    assert r == pytest.approx(1 / 3)
    assert (nw, nh) == (640, 360)
    assert left == 0 and top == 140


def test_letterbox_output_geometry_and_padding():
    frames = (np.ones((2, 100, 200, 3)) * 255).astype(np.uint8)
    imgs, r, (left, top) = letterbox(jnp.asarray(frames), 64)
    assert imgs.shape == (2, 64, 64, 3)
    out = np.asarray(imgs[0, :, :, 0])
    # content rows are 1.0; padded rows are 114/255
    assert out[0, 0] == pytest.approx(114 / 255, abs=1e-6)
    mid = out[32, 32]
    assert mid == pytest.approx(1.0, abs=1e-6)


def test_scale_boxes_roundtrip():
    h, w = 720, 1280
    r, (nw, nh), (left, top) = letterbox_params(h, w, 640)
    orig = jnp.array([[100.0, 200.0, 500.0, 600.0]])
    lb = orig * r + jnp.array([left, top, left, top], jnp.float32)
    back = scale_boxes(lb, r, (left, top), (h, w))
    np.testing.assert_allclose(np.asarray(back), np.asarray(orig), atol=1e-3)


def test_box_iou():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = np.asarray(box_iou_xyxy(a, b))[0]
    assert iou[0] == pytest.approx(1.0)
    assert iou[1] == pytest.approx(25 / 175, rel=1e-5)
    assert iou[2] == 0.0


def test_nms_suppresses_overlaps():
    boxes = jnp.array(
        [[[0.0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 0, 0]]]
    )
    probs = jnp.array([[[0.9], [0.8], [0.7], [0.0]]])
    out = batched_nms(boxes, probs, conf_thres=0.25, iou_thres=0.5, max_det=4)
    assert int(out["count"][0]) == 2
    kept = np.asarray(out["boxes"][0][: 2])
    np.testing.assert_allclose(kept[0], [0, 0, 10, 10])
    np.testing.assert_allclose(kept[1], [50, 50, 60, 60])


def test_nms_class_aware():
    boxes = jnp.array([[[0.0, 0, 10, 10], [1, 1, 11, 11]]])
    probs = jnp.array([[[0.9, 0.0], [0.0, 0.8]]])  # different classes
    out = batched_nms(boxes, probs, conf_thres=0.25, iou_thres=0.5, max_det=4)
    assert int(out["count"][0]) == 2  # overlap but different class → both kept


def test_v10_topk_select():
    boxes = jnp.zeros((1, 100, 4)).at[0, 7].set(jnp.array([1.0, 2, 3, 4]))
    probs = jnp.zeros((1, 100, 2)).at[0, 7, 1].set(0.95).at[0, 3, 0].set(0.5)
    out = v10_topk_select(boxes, probs, conf_thres=0.3, max_det=10)
    assert int(out["count"][0]) == 2
    assert int(out["classes"][0, 0]) == 1
    np.testing.assert_allclose(np.asarray(out["boxes"][0, 0]), [1, 2, 3, 4])


def test_crop_masks():
    masks = jnp.ones((1, 1, 8, 8))
    boxes = jnp.array([[[2.0, 2, 6, 6]]])
    out = np.asarray(crop_masks(masks, boxes))[0, 0]
    assert out[:2].sum() == 0 and out[2:6, 2:6].sum() == 16


def test_decode_masks_shapes_and_threshold():
    B, Hp, Wp, nm, N = 1, 16, 16, 32, 5
    protos = jnp.asarray(np.random.default_rng(0).normal(size=(B, Hp, Wp, nm)), jnp.float32)
    coeffs = jnp.asarray(np.random.default_rng(1).normal(size=(B, N, nm)), jnp.float32)
    boxes = jnp.tile(jnp.array([[[8.0, 8, 56, 56]]]), (B, N, 1))
    m = decode_masks(protos, coeffs, boxes, (64, 64), upsample=True, threshold=0.5)
    assert m.shape == (B, N, 64, 64)
    vals = np.unique(np.asarray(m))
    assert set(vals).issubset({0.0, 1.0})


@pytest.mark.parametrize(
    "h,w,imgsz",
    [
        (720, 1280, 640),    # n=2 (middle-two average)
        (1080, 1920, 640),   # n=3 (single center tap — NOT a block mean)
        (288, 512, 128),     # n=4 (middle-two of four)
        (192, 256, 64),      # n=3 with width-driven ratio
    ],
)
def test_letterbox_integer_downscale_matches_cv2(h, w, imgsz):
    """Exact integer-ratio downscale matches cv2.resize INTER_LINEAR taps
    (the reference's host letterbox) at every factor, not just n=2."""
    import cv2

    rng = np.random.default_rng(5)
    frame = rng.integers(0, 255, (h, w, 3), np.uint8)
    imgs, r, (left, top) = letterbox(jnp.asarray(frame[None]), imgsz)
    _, (nw, nh), _ = letterbox_params(h, w, imgsz)
    ref = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_LINEAR) / 255.0
    got = np.asarray(
        imgs[0, top : top + nh, left : left + nw, :], np.float32
    )
    np.testing.assert_allclose(got, ref, atol=1.5 / 255.0)
    # padding filled with 114/255
    if top:
        np.testing.assert_allclose(np.asarray(imgs[0, :top]), 114 / 255.0, atol=1e-6)


def test_letterbox_noninteger_ratio_matches_cv2():
    """Non-integer ratios use 2-tap interpolation (cv2 INTER_LINEAR, no
    anti-aliasing) — jax.image.resize's anti-aliased downscale would deviate."""
    import cv2

    rng = np.random.default_rng(6)
    frame = rng.integers(0, 255, (500, 700, 3), np.uint8)  # r = 640/700
    imgs, r, (left, top) = letterbox(jnp.asarray(frame[None]), 640)
    _, (nw, nh), _ = letterbox_params(500, 700, 640)
    ref = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_LINEAR) / 255.0
    got = np.asarray(imgs[0, top : top + nh, left : left + nw, :], np.float32)
    np.testing.assert_allclose(got, ref, atol=2.0 / 255.0)


def test_letterbox_bgr_to_rgb_flag():
    frame = np.zeros((8, 8, 3), np.uint8)
    frame[..., 0] = 200  # blue channel (BGR)
    imgs, _, _ = letterbox(jnp.asarray(frame[None]), 8, bgr_to_rgb=True)
    assert float(imgs[0, 0, 0, 2]) == pytest.approx(200 / 255.0, abs=1e-3)
    assert float(imgs[0, 0, 0, 0]) == 0.0
