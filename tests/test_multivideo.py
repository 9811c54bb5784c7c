"""Multi-video batch analytics (BASELINE config 5): cross-video device batching
must produce identical results to per-video sequential processing."""

import numpy as np
import pytest


def _make_video(path, n, seed, h=64, w=96):
    import cv2

    rng = np.random.default_rng(seed)
    out = cv2.VideoWriter(str(path), cv2.VideoWriter.fourcc(*"mp4v"), 30.0, (w, h))
    for i in range(n):
        f = np.zeros((h, w, 3), np.uint8)
        cv2.rectangle(f, (20, 28), (max(25, 70 - i - seed), 38), (255, 255, 255), -1)
        out.write(f)
    out.release()


@pytest.fixture(scope="module")
def pipeline():
    from yolo_puncture_tpu.pipeline import VideoSpeedPipeline
    from yolo_puncture_tpu.predict import YOLO
    from yolo_puncture_tpu.tasks import ClassifierNet

    det = YOLO("yolov8n-seg", nc=1, max_det=8)
    cls = ClassifierNet("efficientnet_b0", input_size=96)
    return VideoSpeedPipeline(det, cls, device_batch=4, imgsz=64, crop_size=96)


def test_interleaved_matches_sequential(pipeline, tmp_path):
    paths = []
    for i, n in enumerate([7, 5, 9]):
        p = tmp_path / f"video{i + 1}.mp4"
        _make_video(p, n, seed=i)
        paths.append(str(p))

    batched = pipeline.process_videos(paths, conf=0.5, judge_wnd=3, interleave=True)
    sequential = pipeline.process_videos(paths, conf=0.5, judge_wnd=3, interleave=False)

    assert set(batched) == set(sequential) == {"video1", "video2", "video3"}
    for name in batched:
        b, s = batched[name], sequential[name]
        assert len(b.lens) == len(s.lens)
        np.testing.assert_allclose(b.lens, s.lens, rtol=1e-5, atol=1e-4)
        assert b.classes == s.classes
        assert b.detected == s.detected
        assert b.start_frame == s.start_frame
        assert b.end_frame == s.end_frame


def test_mixed_resolution_falls_back(pipeline, tmp_path):
    p1 = tmp_path / "a.mp4"
    p2 = tmp_path / "b.mp4"
    _make_video(p1, 4, 0, h=64, w=96)
    _make_video(p2, 4, 1, h=48, w=64)
    out = pipeline.process_videos([str(p1), str(p2)], conf=0.9, judge_wnd=3)
    assert len(out) == 2
    assert len(out["a"].lens) == 4 and len(out["b"].lens) == 4
