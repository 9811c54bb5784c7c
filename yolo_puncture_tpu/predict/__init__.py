from yolo_puncture_tpu.predict.predictor import YOLO, parse_model_name  # noqa: F401
from yolo_puncture_tpu.predict.results import Results, Boxes, Masks  # noqa: F401
