"""yolo_seg/utils/transform.py surface (reference :15-56)."""

from yolo_puncture_tpu.utils import numpy2tensor  # noqa: F401
from yolo_puncture_tpu.utils.transform import crop_frame  # noqa: F401

__all__ = ["numpy2tensor", "crop_frame"]
