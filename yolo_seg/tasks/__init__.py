"""The reference's ``yolo_seg.tasks`` export surface
(yolo_seg/tasks/__init__.py:1-18)."""

from yolo_seg.tasks.needle_clasify import (
    load_classify_net,
    predict_and_find_start_inserted,
    predict_images,
)
from yolo_seg.tasks.unet_segment import load_unet, unet_predict

__all__ = [
    "load_classify_net",
    "predict_images",
    "predict_and_find_start_inserted",
    "load_unet",
    "unet_predict",
]
