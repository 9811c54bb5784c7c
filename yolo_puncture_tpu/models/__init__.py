from yolo_puncture_tpu.models.yolo import YOLOModel, SCALES, make_divisible  # noqa: F401
