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


# -- Platt confidence calibration (yolo_cli calibrate / load_calibration) -----


def test_calibration_roundtrip_and_monotone(tmp_path):
    import json

    det = YOLO("yolov8n-seg", nc=1, max_det=20, max_masks=8)
    assert det.conf_calib is None
    # sidecar load from a checkpoint-style dir
    d = tmp_path / "step_100"
    d.mkdir()
    (d / "calibration.json").write_text(json.dumps({"a": 2.0, "b": 1.0}))
    assert det.load_calibration(str(d)) == (2.0, 1.0)
    # user→raw inverse is the exact inverse of the device-side forward map
    for u in (0.9, 0.5, 0.35, 0.25, 0.05):
        raw = det._calib_to_raw(u, det.conf_calib)
        a, b = det.conf_calib
        s = np.clip(raw, 1e-6, 1 - 1e-6)
        fwd = 1 / (1 + np.exp(-(a * np.log(s / (1 - s)) + b)))
        assert abs(fwd - u) < 1e-5
    # monotone: calibrated ordering preserves raw ordering
    raws = [det._calib_to_raw(u, det.conf_calib) for u in (0.1, 0.3, 0.5, 0.7, 0.9)]
    assert raws == sorted(raws)
    # missing sidecar leaves calibration untouched
    assert det.load_calibration(str(tmp_path / "nope")) == (2.0, 1.0)
    det.load_calibration(None)
    assert det.conf_calib is None


def test_calibrated_predict_reports_calibrated_conf():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)
    det = YOLO("yolov8n-seg", nc=1, max_det=20, max_masks=8)
    base = det.predict(img, conf=0.0, imgsz=64, retina_masks=False)[0]
    det.load_calibration((2.0, 1.0))
    cal = det.predict(img, conf=0.0, imgsz=64, retina_masks=False)[0]
    assert len(cal.boxes) == len(base.boxes)
    s = np.clip(np.asarray(base.boxes.conf), 1e-6, 1 - 1e-6)
    expect = 1 / (1 + np.exp(-(2.0 * np.log(s / (1 - s)) + 1.0)))
    np.testing.assert_allclose(np.asarray(cal.boxes.conf), expect, atol=1e-4)


def test_calibrate_platt_fit_recovers_separation(tmp_path):
    """cmd_calibrate's Newton fit: high-score TPs / low-score FPs → a mapping
    that pushes the TP cluster above 0.9 and the FP cluster below 0.5."""
    import sys

    sys.path.insert(0, "apps")
    import numpy as np

    # standalone re-run of the fit numerics on synthetic (score, label) data
    rng = np.random.default_rng(1)
    s = np.concatenate([rng.uniform(0.45, 0.75, 200), rng.uniform(0.05, 0.3, 200)])
    y = np.concatenate([np.ones(200), np.zeros(200)])
    s = np.clip(s, 1e-6, 1 - 1e-6)
    x = np.log(s / (1 - s))
    n1, n0 = y.sum(), len(y) - y.sum()
    t = np.where(y > 0.5, (n1 + 1) / (n1 + 2), 1 / (n0 + 2))
    a, b = 1.0, 0.0
    for _ in range(50):
        p = 1 / (1 + np.exp(-(a * x + b)))
        g = np.array([((p - t) * x).sum(), (p - t).sum()])
        w = p * (1 - p)
        H = np.array([[(w * x * x).sum() + 1e-6, (w * x).sum()],
                      [(w * x).sum(), w.sum() + 1e-6]])
        da, db = np.linalg.solve(H, g)
        a, b = a - da, b - db
    p_tp = 1 / (1 + np.exp(-(a * np.log(0.6 / 0.4) + b)))
    p_fp = 1 / (1 + np.exp(-(a * np.log(0.15 / 0.85) + b)))
    assert p_tp > 0.9 and p_fp < 0.1
