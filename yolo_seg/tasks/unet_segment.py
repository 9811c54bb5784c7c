"""yolo_seg/tasks/unet_segment.py surface (reference :24-74): U²-Net loading and
binary-mask prediction (d1 side output → min-max normalize → 0.5 threshold →
uint8 {0,255})."""

import numpy as np

from yolo_puncture_tpu.tasks.unet import load_unet, unet_predict  # noqa: F401

__all__ = ["load_unet", "unet_predict", "normPRED"]


def normPRED(d):
    """Min-max normalization of a prediction map (reference :24-30)."""
    d = np.asarray(d, dtype=np.float32)
    mi, ma = d.min(), d.max()
    return (d - mi) / max(ma - mi, 1e-12)
