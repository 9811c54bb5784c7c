from yolo_puncture_tpu.train.assigner import task_aligned_assign, bbox_ciou  # noqa: F401
from yolo_puncture_tpu.train.losses import detection_loss  # noqa: F401
from yolo_puncture_tpu.train.trainer import Trainer, TrainState  # noqa: F401
from yolo_puncture_tpu.train.metrics import compute_map  # noqa: F401
