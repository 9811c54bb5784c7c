from yolo_puncture_tpu.pipeline.video import VideoReader, sort_key, iter_video_frames  # noqa: F401
from yolo_puncture_tpu.pipeline.runner import VideoSpeedPipeline, PipelineOutput  # noqa: F401
