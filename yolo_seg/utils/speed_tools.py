"""yolo_seg/utils/speed_tools.py surface (reference :15-97): 1-D smoothing,
derivative, diagnostic plot, speed-deviation metrics."""

from yolo_puncture_tpu.analytics.stats import compute_metrics  # noqa: F401
from yolo_puncture_tpu.ops.signal import (  # noqa: F401
    difference,
    gaussian_smoothing,
    savitzky_golay_smoothing,
)
from yolo_puncture_tpu.utils.plotting import plot_speeds  # noqa: F401

__all__ = [
    "gaussian_smoothing",
    "savitzky_golay_smoothing",
    "difference",
    "plot_speeds",
    "compute_metrics",
]
