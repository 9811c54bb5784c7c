"""The reference's 17-symbol ``yolo_seg.utils`` export surface
(yolo_seg/utils/__init__.py:1-49)."""

from yolo_seg.utils.config import get_config
from yolo_seg.utils.mask_tools import (
    create_roi_mask,
    filter_masks,
    get_bi_mask,
    get_bi_min_rect_len,
    get_coord_mask,
    get_coord_min_rect_len,
)
from yolo_seg.utils.segment_anything import segment_anything
from yolo_seg.utils.speed_tools import (
    compute_metrics,
    difference,
    gaussian_smoothing,
    plot_speeds,
    savitzky_golay_smoothing,
)
from yolo_seg.utils.transform import crop_frame, numpy2tensor
from yolo_seg.utils.video_reader import VideoReader, sort_key

__all__ = [
    "get_config",
    "get_coord_min_rect_len",
    "get_bi_min_rect_len",
    "get_coord_mask",
    "get_bi_mask",
    "create_roi_mask",
    "filter_masks",
    "segment_anything",
    "gaussian_smoothing",
    "savitzky_golay_smoothing",
    "difference",
    "plot_speeds",
    "compute_metrics",
    "numpy2tensor",
    "crop_frame",
    "VideoReader",
    "sort_key",
]
