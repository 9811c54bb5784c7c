"""yolo_seg/stats/speed_freq.py surface (reference :10-124): offline
speed-frequency statistics over ``{lens, key_frame}`` pickles.  The reference
file is a script whose helper functions are re-used; the batch driver lives at
``apps/speed_freq.py`` (``python apps/speed_freq.py --pkl_dir ...``)."""

import os
import sys

# direct script invocation (`python yolo_seg/stats/speed_freq.py`, the
# reference's own usage form): sys.path[0] is yolo_seg/stats — add the repo
# root so the framework packages resolve
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from yolo_puncture_tpu.analytics.stats import (  # noqa: F401
    calculate_speed_mm,
    compute_pixel_to_mm_ratio,
    remove_outliers,
)
from apps.speed_freq import main, process_pickle  # noqa: F401

__all__ = [
    "remove_outliers",
    "calculate_speed_mm",
    "compute_pixel_to_mm_ratio",
    "process_pickle",
    "main",
]

if __name__ == "__main__":
    main()
