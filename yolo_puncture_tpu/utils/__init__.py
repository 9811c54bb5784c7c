"""Utils namespace — exports the reference's 17-function surface
(yolo_seg/utils/__init__.py:31-49) under the same names, so reference code can
swap imports wholesale."""

from yolo_puncture_tpu.utils.config import get_config, load_config, Config  # noqa: F401
from yolo_puncture_tpu.ops.geometry import (  # noqa: F401
    min_rect_len as get_coord_min_rect_len,
    min_rect_len_mask as get_bi_min_rect_len,
    polygon_to_mask as get_coord_mask,
    binary_mask_overlay as get_bi_mask,
    create_roi_mask,
    filter_masks,
)
from yolo_puncture_tpu.ops.signal import (  # noqa: F401
    gaussian_smoothing,
    savitzky_golay_smoothing,
    difference,
)
from yolo_puncture_tpu.analytics.stats import compute_metrics  # noqa: F401
from yolo_puncture_tpu.utils.transform import crop_frame  # noqa: F401
from yolo_puncture_tpu.utils.plotting import plot_speeds  # noqa: F401


def numpy2tensor(frame):
    """BGR uint8 → RGB float CHW-style array in [0,1] (transform.numpy2tensor
    contract, torch-free: returns (3, H, W) numpy)."""
    import numpy as np

    rgb = frame[..., ::-1].astype("float32") / 255.0
    return np.transpose(rgb, (2, 0, 1))


def segment_anything(*args, **kwargs):
    from yolo_puncture_tpu.utils.sam_wrapper import segment_anything as _sa

    return _sa(*args, **kwargs)


def show_anns(*args, **kwargs):
    from yolo_puncture_tpu.utils.sam_wrapper import show_anns as _sh

    return _sh(*args, **kwargs)


def __getattr__(name):
    # lazy: VideoReader/sort_key live in pipeline (avoid import cycle)
    if name in ("VideoReader", "sort_key"):
        from yolo_puncture_tpu.pipeline import video

        return getattr(video, name)
    raise AttributeError(name)


__all__ = [
    "get_config",
    "get_coord_min_rect_len",
    "get_bi_min_rect_len",
    "get_coord_mask",
    "get_bi_mask",
    "create_roi_mask",
    "filter_masks",
    "segment_anything",
    "show_anns",
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
