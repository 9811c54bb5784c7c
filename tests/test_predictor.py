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


def test_predict_pil_and_plot(tiny_predictor):
    from PIL import Image

    img = Image.fromarray(
        np.random.default_rng(2).integers(0, 255, size=(80, 80, 3), dtype=np.uint8)
    )
    results = tiny_predictor.predict(source=img, conf=0.5, imgsz=64)
    annotated = results[0].plot()
    assert annotated.shape == (80, 80, 3)


def test_compiled_cache_reuse(tiny_predictor):
    frame = np.zeros((64, 64, 3), np.uint8)
    tiny_predictor.predict(source=frame, conf=0.5, imgsz=64)
    n = len(tiny_predictor._compiled)
    tiny_predictor.predict(source=frame, conf=0.7, imgsz=64)  # same geometry
    assert len(tiny_predictor._compiled) == n
