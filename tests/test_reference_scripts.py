"""Ultimate drop-in proof: the reference's OWN batch CLI
(dev_tools/auto_speed_calc.py) executes unchanged against this framework — its
`from ultralytics import YOLO` / `from yolo_seg.tasks import …` /
`from yolo_seg.utils import …` imports are served by the compat packages, and
its full speed state machine runs to a computed mm/s result.

The reference tree is read at runtime (never copied into this repo); the test
skips when it isn't present.  Model OUTPUTS are stubbed deterministically
(random weights would make mask sizes and classes arbitrary — the reference
even ZeroDivision-crashes on zero-length masks):
  * `YOLO.predict` returns real `Results/Boxes/Masks` objects (the exact
    surface the script consumes: .boxes.cpu().numpy().cls/.conf/.xyxy,
    .masks.xy contour polygons) with a needle mask that shrinks after frame 5;
  * `ClassifierNet.predict` returns class 0 before frame 5, class 1 after.
Everything else — imports, result-object semantics, min-rect lengths on the
contour polygons, crop_frame, Gaussian smoothing, key-frame window voting +
sequence repair, pixel→mm calibration, the insertion state machine — is the
reference's code running on this framework's implementations.  (The conv
forwards themselves are covered by tests/test_predictor.py, test_golden.py,
test_classifiers.py.)
"""

import os
import runpy

import numpy as np
import pytest

REF_SCRIPT = "/root/reference/dev_tools/auto_speed_calc.py"

N_FRAMES = 16
KEY_FRAME = 5
FPS = 30.0
# needle mask length per frame: constant 40 px pre-insert, shrinking 3 px/frame
# afterwards (20 mm / 40 px calibration → 18 mm crossed a few frames in)
LENGTHS = [40] * KEY_FRAME + [max(40 - 3 * (i + 1), 10) for i in range(N_FRAMES - KEY_FRAME)]


@pytest.mark.skipif(not os.path.exists(REF_SCRIPT), reason="reference tree not present")
def test_reference_auto_speed_calc_runs_verbatim(tmp_path, monkeypatch):
    import cv2

    vid = tmp_path / "video3.mp4"
    out = cv2.VideoWriter(str(vid), cv2.VideoWriter.fourcc(*"mp4v"), FPS, (96, 64))
    for _ in range(N_FRAMES):
        out.write(np.zeros((64, 96, 3), np.uint8))
    out.release()

    from yolo_puncture_tpu.predict import YOLO
    from yolo_puncture_tpu.predict.results import Boxes, Masks, Results

    calls = {"det": 0, "cls": 0}

    def fake_yolo_predict(self, source=None, conf=0.25, **kw):
        i = calls["det"]
        calls["det"] += 1
        length = LENGTHS[i]
        mask = np.zeros((64, 96), np.float32)
        mask[30:36, 4 : 4 + length] = 1.0  # 6-px-thick horizontal needle
        boxes = Boxes(
            np.array([[4.0, 30.0, 4.0 + length, 36.0]]),
            np.array([0.97]),
            np.array([0.0]),
            (64, 96),
        )
        return [Results(np.asarray(source), boxes, Masks(mask[None], (64, 96)))]

    monkeypatch.setattr(YOLO, "predict", fake_yolo_predict)

    from yolo_puncture_tpu.tasks.classify import ClassifierNet

    def fake_cls_predict(self, images):
        n = len(images)
        i0 = calls["cls"]
        calls["cls"] += n
        idx = np.array([0 if i < KEY_FRAME else 1 for i in range(i0, i0 + n)], np.int64)
        return idx, np.full((n,), 0.95, np.float64)

    monkeypatch.setattr(ClassifierNet, "predict", fake_cls_predict)
    monkeypatch.setattr(
        ClassifierNet, "__init__", lambda self, *a, **k: setattr(self, "input_size", 380)
    )

    mod = runpy.run_path(REF_SCRIPT, run_name="ref_auto_speed_calc")
    mod["process_video"](str(vid), "yolov8n-seg", "EfficientNet_23.pkl", 0.9, 5)

    assert calls["det"] == N_FRAMES  # one predict per decoded frame
    info = mod["video_info_dict"]["video3"]
    # key-frame voting (judge_wnd=5, probs 0.95 ≥ 0.9 ladder, 5 consecutive)
    # lands exactly on the class flip
    assert info["start_frame"] == KEY_FRAME
    # the smoothed length series crosses 18 mm equivalent (0.9 × the 5-frame
    # pre-insert calibration average) a few frames after the key frame
    assert info["end_frame"] is not None and KEY_FRAME <= info["end_frame"] < N_FRAMES
    # speed = 2 mm over the detected interval (reference :118-122)
    expected = 2.0 / (max(1, info["end_frame"] - info["start_frame"]) / FPS)
    assert info["speed"] == pytest.approx(expected)
    assert 0.0 < info["speed"] < 80.0
