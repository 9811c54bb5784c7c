"""Reference utils-surface parity: same 17 names, same behaviors."""

import numpy as np


def test_all_reference_names_importable():
    import yolo_puncture_tpu.utils as u

    for name in [
        "get_config", "get_coord_min_rect_len", "get_bi_min_rect_len",
        "get_coord_mask", "get_bi_mask", "create_roi_mask", "filter_masks",
        "segment_anything", "gaussian_smoothing", "savitzky_golay_smoothing",
        "difference", "plot_speeds", "compute_metrics", "numpy2tensor",
        "crop_frame", "VideoReader", "sort_key",
    ]:
        assert getattr(u, name) is not None


def test_reference_style_usage():
    from yolo_puncture_tpu.utils import (
        crop_frame,
        gaussian_smoothing,
        get_config,
        get_coord_mask,
        get_coord_min_rect_len,
        numpy2tensor,
    )

    cfg = get_config()
    assert hasattr(cfg.PATH, "WEIGHTS_PATH")

    poly = [(10, 10), (60, 12), (58, 30), (12, 28)]
    length, ratio = get_coord_min_rect_len(poly)
    assert length > 40 and ratio > 1

    mask = get_coord_mask((40, 80, 3), poly)
    assert mask.shape == (40, 80, 3) and mask.sum() > 0

    frame = np.zeros((50, 60, 3), np.uint8)
    crop, coords = crop_frame(frame, [10, 10, 30, 30], crop_size=20)
    assert crop.shape[:2] == (20, 20)

    t = numpy2tensor(frame)
    assert t.shape == (3, 50, 60) and t.dtype == np.float32

    sm = gaussian_smoothing([1.0] * 30)
    assert isinstance(sm, list) and len(sm) == 30


def test_show_anns_overlay():
    from yolo_puncture_tpu.utils import show_anns

    seg = np.zeros((20, 30), bool)
    seg[5:10, 5:15] = True
    out = show_anns((20, 30, 3), [{"segmentation": seg, "area": 50.0}])
    assert out.shape == (20, 30, 3)
    assert out.sum() > 0
    assert show_anns((20, 30, 3), []).sum() == 0
