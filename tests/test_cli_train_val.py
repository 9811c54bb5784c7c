"""yolo_cli train/val/export/predict driven end-to-end on a tiny synthetic dataset."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("needle_ds")
    for split, n in (("train", 4), ("val", 2)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            img = np.zeros((80, 80, 3), np.uint8)
            cv2.rectangle(img, (20, 35), (60, 45), (255, 255, 255), -1)
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img)
            (root / "labels" / split / f"{i}.txt").write_text(
                "0 0.25 0.4375 0.75 0.4375 0.75 0.5625 0.25 0.5625\n"
            )
    return str(root)


def test_train_two_steps(dataset, tmp_path):
    from apps.yolo_cli import main

    state = main([
        "train", f"data={dataset}", "model=yolov8n-seg", "epochs=1",
        "imgsz=64", "batch=2", f"project={tmp_path / 'run'}",
    ])
    assert int(state.step) == 2  # 4 imgs / batch 2
    # orbax checkpoint written
    ckpts = os.listdir(tmp_path / "run")
    assert any(c.startswith("step_") for c in ckpts)


def test_val_runs(dataset):
    from apps.yolo_cli import main

    m = main(["val", f"data={dataset}", "model=yolov8n-seg", "imgsz=64", "conf=0.5"])
    assert 0.0 <= m["map50"] <= 1.0


def test_export_msgpack(tmp_path):
    from apps.yolo_cli import main

    out = main([
        "export", "model=yolov8n-seg", "format=msgpack",
        f"output={tmp_path / 'w.msgpack'}",
    ])
    assert os.path.getsize(out) > 1e6  # ~3M params ≈ 13MB


def test_export_saved_model_roundtrip(tmp_path):
    """jax2tf SavedModel export reloads in TF and agrees with the JAX serve fn."""
    tf = pytest.importorskip("tensorflow")

    from apps.yolo_cli import main
    from yolo_puncture_tpu.predict import YOLO

    out = main([
        "export", "model=yolov8n-seg", "format=saved_model",
        "imgsz=64", "batch=1", f"output={tmp_path / 'sm'}",
    ])
    loaded = tf.saved_model.load(out)
    frames = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), np.uint8)
    boxes, scores, classes = loaded.serve(tf.constant(frames))
    assert boxes.shape[0] == 1 and boxes.shape[-1] == 4
    # parity with the in-framework predictor's selection on the same weights
    det = YOLO("yolov8n-seg", nc=1)
    ref = det.predict(frames[0], conf=0.25, imgsz=64)[0]
    n = len(ref.boxes.conf)
    got_scores = np.sort(np.asarray(scores)[0])[::-1]
    if n:
        np.testing.assert_allclose(
            got_scores[:n], np.sort(np.asarray(ref.boxes.conf))[::-1], atol=1e-3
        )


def test_export_tflite_v10_and_v8_guard(tmp_path):
    """TFLite export: NMS-free v10 converts and runs under the interpreter;
    v8 (NMS reduce — not legalizable) fails with a clear error."""
    tf = pytest.importorskip("tensorflow")

    from apps.yolo_cli import main

    out = main([
        "export", "model=yolo10n-seg", "format=tflite",
        "imgsz=64", "batch=1", f"output={tmp_path / 'y10n.tflite'}",
    ])
    ip = tf.lite.Interpreter(model_path=out)
    ip.allocate_tensors()
    ip.set_tensor(ip.get_input_details()[0]["index"], np.zeros((1, 64, 64, 3), np.uint8))
    ip.invoke()
    shapes = sorted(tuple(ip.get_tensor(d["index"]).shape) for d in ip.get_output_details())
    assert (1, 300, 4) in shapes  # boxes (max_det=300)
    with pytest.raises(SystemExit, match="NMS-free v10"):
        main([
            "export", "model=yolov8n-seg", "format=tflite",
            "imgsz=64", "batch=1", f"output={tmp_path / 'y8n.tflite'}",
        ])


def test_predict_cmd(tmp_path):
    import cv2

    from apps.yolo_cli import main

    img = np.zeros((64, 64, 3), np.uint8)
    p = str(tmp_path / "x.jpg")
    cv2.imwrite(p, img)
    results = main(["predict", "model=yolov8n-seg", f"source={p}", "imgsz=64", "conf=0.9"])
    assert len(results) == 1


def test_plot_speeds(tmp_path):
    from yolo_puncture_tpu.utils.plotting import plot_speeds

    lens = [100.0] * 30 + list(100 - 2.0 * np.arange(20))
    out = str(tmp_path / "chart.png")
    plot_speeds(lens, (30, 40), act_range=(30, 41), file_path=out)
    assert os.path.exists(out)
