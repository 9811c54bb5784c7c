from yolo_puncture_tpu.ops.letterbox import letterbox, scale_boxes, letterbox_params  # noqa: F401
from yolo_puncture_tpu.ops.nms import batched_nms, v10_topk_select, select_detections  # noqa: F401
from yolo_puncture_tpu.ops.masks import decode_masks, crop_masks  # noqa: F401
from yolo_puncture_tpu.ops.signal import (  # noqa: F401
    gaussian_smoothing,
    savitzky_golay_smoothing,
    difference,
)
from yolo_puncture_tpu.ops import geometry  # noqa: F401
