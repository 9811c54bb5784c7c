"""Predictor E2E: ultralytics-compatible API surface with random weights."""

import numpy as np
import pytest

from yolo_puncture_tpu.predict import YOLO, parse_model_name


def test_parse_model_name():
    assert parse_model_name("seg/yolo11n-seg-finetune.pt") == ("v11", "n", "segment")
    assert parse_model_name("seg/yolov8n-seg-finetune.pt") == ("v8", "n", "segment")
    assert parse_model_name("yolov10s.pt") == ("v10", "s", "detect")
    assert parse_model_name("yolo10s-seg") == ("v10", "s", "segment")
    with pytest.raises(ValueError):
        parse_model_name("resnet50.pt")


@pytest.fixture(scope="module")
def tiny_predictor():
    # v8n-seg at small imgsz for CPU test speed
    return YOLO("yolov8n-seg", nc=1, max_det=20, max_masks=8)


def test_predict_api_surface(tiny_predictor):
    frame = np.random.default_rng(0).integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    results = tiny_predictor.predict(source=frame, conf=0.5, imgsz=64, retina_masks=True)
    assert len(results) == 1
    r = results[0]
    assert r.orig_shape == (96, 128)
    boxes = r.boxes.cpu().numpy()  # chaining is a no-op
    assert boxes.xyxy.shape[1] == 4
    assert boxes.conf.ndim == 1 and boxes.cls.ndim == 1
    assert boxes.xywhn.shape == boxes.xyxy.shape
    if len(boxes):
        assert boxes.xyxy[:, 0].min() >= 0
        assert boxes.xyxy[:, 2].max() <= 128
    if r.masks is not None and len(r.masks):
        assert r.masks.data.shape[1:] == (96, 128)
        polys = r.masks.xy
        assert isinstance(polys, list)


def test_predict_batch_and_shape_grouping(tiny_predictor):
    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    b = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    c = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    results = tiny_predictor.predict(source=[a, b, c], conf=0.9, imgsz=64)
    assert len(results) == 3
    assert results[2].orig_shape == (48, 64)
    # empty batch → empty results, no device call (ultralytics behavior)
    assert tiny_predictor.predict(source=[], conf=0.9, imgsz=64) == []


def test_predict_pil_and_plot(tiny_predictor):
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(2).integers(0, 255, size=(80, 80, 3), dtype=np.uint8)
    )
    results = tiny_predictor.predict(source=img, conf=0.5, imgsz=64)
    annotated = results[0].plot()
    assert annotated.shape == (80, 80, 3)


def test_normalized_float_source_matches_uint8(tiny_predictor):
    """frame.astype(float)/255 — a common normalized usage — must not truncate
    to an all-black image (bare astype(uint8) would)."""
    frame = np.random.default_rng(3).integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    r_u8 = tiny_predictor.predict(source=frame, conf=0.01, imgsz=64)[0]
    r_f = tiny_predictor.predict(
        source=frame.astype(np.float32) / 255.0, conf=0.01, imgsz=64
    )[0]
    np.testing.assert_allclose(r_f.boxes.xyxy, r_u8.boxes.xyxy, atol=1e-5)
    np.testing.assert_allclose(r_f.boxes.conf, r_u8.boxes.conf, atol=1e-6)


def test_one_mask_per_box_beyond_max_masks():
    """Boxes and masks stay 1:1 even past max_masks (overflow chunk decode)."""
    model = YOLO("yolov8n-seg", nc=1, max_det=12, max_masks=3)
    frame = np.random.default_rng(1).integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    r = model.predict(source=frame, conf=0.0, imgsz=64, iou=1.0)[0]
    n = len(r.boxes)
    assert n > model.max_masks  # conf=0, iou=1 keeps many detections
    assert r.masks is not None and len(r.masks.data) == n
    # overflow-decoded masks use the same decode path: re-run with max_masks
    # large enough to cover everything in the main program and compare
    ref = YOLO("yolov8n-seg", nc=1, max_det=12, max_masks=12)
    ref.variables = model.variables
    r2 = ref.predict(source=frame, conf=0.0, imgsz=64, iou=1.0)[0]
    assert len(r2.boxes) == n
    np.testing.assert_array_equal(r.masks.data, r2.masks.data[:n])


def test_compiled_cache_reuse(tiny_predictor):
    frame = np.zeros((64, 64, 3), np.uint8)
    tiny_predictor.predict(source=frame, conf=0.5, imgsz=64)
    n = len(tiny_predictor._compiled)
    tiny_predictor.predict(source=frame, conf=0.7, imgsz=64)  # same geometry
    assert len(tiny_predictor._compiled) == n


def test_predict_dir_and_video_sources(tiny_predictor, tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(4)
    d = tmp_path / "imgs"
    d.mkdir()
    for name in ("b.jpg", "a.png"):
        cv2.imwrite(str(d / name), rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
    results = tiny_predictor.predict(source=str(d), conf=0.9, imgsz=64)
    assert len(results) == 2
    # name-sorted order: a.png before b.jpg
    assert [r.path for r in results] == [str(d / "a.png"), str(d / "b.jpg")]

    vid = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for _ in range(3):
        w.write(rng.integers(0, 255, (48, 64, 3)).astype(np.uint8))
    w.release()
    results = tiny_predictor.predict(source=vid, conf=0.9, imgsz=64)
    assert len(results) == 3
    assert all(r.orig_shape == (48, 64) for r in results)
