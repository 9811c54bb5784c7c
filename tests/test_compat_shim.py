"""The `yolo_seg` / `ultralytics` compatibility packages: reference user code
(daisy9542/yolo-puncture import surface) must run unchanged on this framework.
Reference surfaces: yolo_seg/utils/__init__.py:31-49, tasks/__init__.py:1-18,
yolo_with_deva.py:91-100, app.py:25-28."""

import numpy as np
import pytest


def test_utils_export_surface():
    import yolo_seg.utils as u

    assert set(u.__all__) == {
        "get_config", "get_coord_min_rect_len", "get_bi_min_rect_len",
        "get_coord_mask", "get_bi_mask", "create_roi_mask", "filter_masks",
        "segment_anything", "gaussian_smoothing", "savitzky_golay_smoothing",
        "difference", "plot_speeds", "compute_metrics", "numpy2tensor",
        "crop_frame", "VideoReader", "sort_key",
    }
    for name in u.__all__:
        assert callable(getattr(u, name)) or name == "VideoReader"


def test_utils_functional_smoke():
    from yolo_seg.utils import (
        gaussian_smoothing,
        get_bi_mask,
        get_config,
        get_coord_mask,
        get_coord_min_rect_len,
        sort_key,
    )

    # axis-aligned 10×4 rectangle polygon → long side 10, aspect 2.5
    poly = [(0, 0), (10, 0), (10, 4), (0, 4)]
    length, ratio = get_coord_min_rect_len(poly)
    assert length == pytest.approx(10.0)
    assert ratio == pytest.approx(2.5)

    m = get_coord_mask((8, 8, 3), [(1, 1), (6, 1), (6, 6), (1, 6)])
    assert m.shape == (8, 8, 3) and m.max() == 255

    bi = np.zeros((4, 4), bool)
    bi[1, 2] = True
    overlay = get_bi_mask((6, 6, 3), bi, x_offset=1, y_offset=2)
    assert tuple(overlay[3, 3]) == (255, 255, 0)

    s = gaussian_smoothing([1.0, 2.0, 10.0, 2.0, 1.0])
    assert s[2] < 10.0
    assert tuple(sort_key("12frame_7.jpg")) == (12, 7)
    assert hasattr(get_config().PATH, "WEIGHTS_PATH")


def test_tasks_surface(monkeypatch):
    import yolo_seg.tasks as t
    from yolo_seg.tasks import needle_clasify

    assert set(t.__all__) == {
        "load_classify_net", "predict_images", "predict_and_find_start_inserted",
        "load_unet", "unet_predict",
    }
    assert needle_clasify.NUM_CLASSES == 2
    assert needle_clasify.INPUT_IMG_SIZE == 380

    # load_classify_net resolves under WEIGHTS_PATH and derives the registry
    # name from the checkpoint filename (reference needle_clasify.py:64-65)
    calls = {}

    def fake(path, name):
        calls["path"], calls["name"] = path, name
        return "net"

    monkeypatch.setattr(needle_clasify, "_load_classify_net", fake)
    assert needle_clasify.load_classify_net("EfficientNet/efficientnet_b3.pth.tar") == "net"
    assert calls["name"] == "efficientnet_b3"
    assert calls["path"] is None  # missing file → random-init fallback

    # normPRED min-max contract (unet_segment.py:24-30)
    from yolo_seg.tasks.unet_segment import normPRED

    d = normPRED(np.array([2.0, 4.0, 6.0]))
    assert d.min() == 0.0 and d.max() == 1.0 and d[1] == pytest.approx(0.5)


def test_model_constructors():
    from yolo_seg.tasks.models.U2Net import U2NET, U2NETP
    from yolo_seg.tasks.models.efficientnet import efficientnet_b3
    from yolo_seg.tasks.models.van import van_b0

    assert U2NET().small is False
    assert U2NETP().small is True
    # timm-style kwargs accepted and stripped (needle_clasify.py:41-52 call)
    net = efficientnet_b3(pretrained=False, num_classes=2, in_chans=3, global_pool=None)
    assert net.variant == "b3" and net.num_classes == 2
    assert van_b0(num_classes=2).variant == "b0"


def test_app_and_stats_surfaces():
    from yolo_seg.app import CONFIRMATION_FRAMES, INIT_SHAFT_LEN, MOVE_THRESHOLD, OUT_EXPAND, yolo_inference
    from yolo_seg.stats.speed_freq import calculate_speed_mm, remove_outliers

    assert (INIT_SHAFT_LEN, MOVE_THRESHOLD, CONFIRMATION_FRAMES, OUT_EXPAND) == (20, 2, 5, 50)
    assert callable(yolo_inference)
    assert remove_outliers([1.0, 1.1, 0.9, 50.0]) == pytest.approx([1.0, 1.1, 0.9])
    assert callable(calculate_speed_mm)


def test_ultralytics_yolo_alias():
    import ultralytics
    from yolo_puncture_tpu.predict import YOLO as OurYOLO

    assert ultralytics.YOLO is OurYOLO
    with pytest.raises(AttributeError):
        ultralytics.not_a_symbol


def test_estimate_forward_mask_leaves_state_unchanged():
    from yolo_puncture_tpu.track.core import TrackerCore
    from yolo_seg.yolo_with_deva import estimate_forward_mask

    core = TrackerCore(image_size=(64, 96), max_objects=2, mem_frames=4, mem_every=2)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (64, 96, 3), np.uint8)
    mask = np.zeros((64, 96), np.int32)
    mask[20:40, 30:60] = 1
    core.incorporate_detection(frame, mask, [type("O", (), {"id": 1, "score": 1.0, "category_id": 0})()])
    ti_before = core.curr_ti
    mem_before = np.asarray(core.memory.values)

    out = estimate_forward_mask(core, frame)
    assert out.shape == (64, 96)
    assert out.dtype.kind in "iu"
    # peek: no time advance, no memory mutation (reference :91-100 reads
    # features for curr_ti+1 without writing memory)
    assert core.curr_ti == ti_before
    np.testing.assert_array_equal(np.asarray(core.memory.values), mem_before)
