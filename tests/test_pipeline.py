"""Fused pipeline + VideoReader contracts."""

import numpy as np
import pytest

from yolo_puncture_tpu.pipeline import VideoSpeedPipeline, VideoReader, sort_key
from yolo_puncture_tpu.predict import YOLO
from yolo_puncture_tpu.tasks import ClassifierNet


def test_sort_key_numeric_order():
    names = ["12frame_10.jpg", "12frame_2.jpg", "12frame_1.jpg"]
    assert sorted(names, key=sort_key) == [
        "12frame_1.jpg", "12frame_2.jpg", "12frame_10.jpg",
    ]


def test_video_reader_image_dir(tmp_path):
    from PIL import Image

    for i in [3, 1, 20]:
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / f"frame_{i}.jpg")
    (tmp_path / "notes.txt").write_text("ignored")
    vr = VideoReader(str(tmp_path))
    assert vr.frames == ["frame_1.jpg", "frame_3.jpg", "frame_20.jpg"]
    img, path = vr[0]
    assert img.shape == (8, 8, 3)
    assert path.endswith("frame_1.jpg")


def test_video_reader_rejects_bad_path(tmp_path):
    with pytest.raises(ValueError):
        VideoReader(str(tmp_path / "nope.txt"))


@pytest.fixture(scope="module")
def pipeline():
    det = YOLO("yolov8n-seg", nc=1, max_det=8)
    cls = ClassifierNet("efficientnet_b0", input_size=96)
    return VideoSpeedPipeline(det, cls, device_batch=4, imgsz=64, crop_size=96)


def test_pipeline_runs_end_to_end(pipeline):
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (96, 128, 3), np.uint8) for _ in range(10)]
    out = pipeline.process_frames(frames, fps=30.0, conf=0.5, judge_wnd=5)
    assert len(out.lens) == 10
    assert len(out.classes) == 10
    assert len(out.boxes) == 10
    assert all(len(b) == 4 for b in out.boxes)
    # monotone repaired classes
    s = out.start_frame
    assert all(c == 0 for c in out.classes[:s])
    assert all(c == 1 for c in out.classes[s + 1 :])


def test_pipeline_empty(pipeline):
    out = pipeline.process_frames([], fps=30.0)
    assert out.lens == [] and out.start_frame is None


def test_pipeline_fallback_box_chain(pipeline):
    # conf=1.0 guarantees zero detections (sigmoid scores are < 1), so the
    # fallback contract is asserted UNCONDITIONALLY — a conditional on
    # detections would silently skip all assertions on a lucky random init
    frames = [np.zeros((96, 128, 3), np.uint8) for _ in range(5)]
    out = pipeline.process_frames(frames, fps=30.0, conf=1.0, judge_wnd=3)
    assert not any(out.detected)
    assert out.boxes[0] == (0, 0, 128, 96)
    assert out.lens == [0.0] * 5
