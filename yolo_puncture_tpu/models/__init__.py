from yolo_puncture_tpu.models.yolo import YOLOModel, SCALES, make_divisible  # noqa: F401
from yolo_puncture_tpu.models.efficientnet import EfficientNet, preprocess_classifier  # noqa: F401
from yolo_puncture_tpu.models.u2net import U2Net, norm_pred  # noqa: F401
from yolo_puncture_tpu.models.van import VAN  # noqa: F401
