"""yolo_seg/utils/video_reader.py surface (reference :17-111): dataset over an
image dir or a video file (decoded to '{video_no}frame_{i}.jpg' in a tempdir),
numeric-aware filename sort."""

from yolo_puncture_tpu.pipeline.video import VideoReader, sort_key  # noqa: F401

__all__ = ["VideoReader", "sort_key"]
