"""yolo_seg/utils/mask_tools.py surface — reference names for the framework's
geometry ops (implementations in yolo_puncture_tpu/ops/geometry.py, pinned
against cv2 by tests/test_geometry.py)."""

from yolo_puncture_tpu.ops.geometry import (  # noqa: F401
    binary_mask_overlay as get_bi_mask,
    create_roi_mask,
    filter_masks,
    min_rect_len as get_coord_min_rect_len,
    min_rect_len_mask as get_bi_min_rect_len,
    polygon_encoding,
    polygon_to_mask as get_coord_mask,
    rle_encoding,
)

__all__ = [
    "get_coord_min_rect_len",
    "get_bi_min_rect_len",
    "get_coord_mask",
    "get_bi_mask",
    "rle_encoding",
    "polygon_encoding",
    "create_roi_mask",
    "filter_masks",
]
