"""Geometry parity vs cv2 (the reference's backend) on random polygons/masks."""

import cv2
import numpy as np
import pytest

from yolo_puncture_tpu.ops import geometry

rng = np.random.default_rng(1)


@pytest.mark.parametrize("trial", range(20))
def test_min_rect_len_matches_cv2(trial):
    rng = np.random.default_rng(100 + trial)  # per-trial: reproducible alone
    n = rng.integers(3, 40)
    pts = rng.uniform(0, 500, size=(n, 2)).astype(np.float32)
    ours_len, ours_ratio = geometry.min_rect_len(pts)
    ipts = np.asarray(pts, dtype=np.int32).reshape(-1, 2)
    (_, (w, h), _) = cv2.minAreaRect(ipts)
    ref_len = max(w, h)
    ref_w = min(w, h) or 1
    assert ours_len == pytest.approx(ref_len, rel=1e-4, abs=1e-3)
    assert ours_ratio == pytest.approx(ref_len / ref_w, rel=1e-3, abs=1e-3)


def test_min_rect_len_degenerate():
    assert geometry.min_rect_len([[1, 1], [2, 2]]) == (0.0, 0.0)
    assert geometry.min_rect_len(np.zeros((0, 2))) == (0.0, 0.0)


def test_min_rect_len_mask_matches_cv2():
    mask = np.zeros((100, 120), dtype=np.uint8)
    mask[30:40, 20:90] = 1  # 10x70 rectangle → long side ≈ 69
    ours_len, ours_ratio = geometry.min_rect_len_mask(mask)
    pts = np.column_stack(np.where(mask)).astype(np.int32)
    (_, (w, h), _) = cv2.minAreaRect(pts)
    assert ours_len == pytest.approx(max(w, h), rel=1e-4, abs=1e-3)


def test_rle_roundtrip_structure():
    seg = np.zeros((5, 5), np.uint8)
    seg[1, 1:4] = 1
    runs = geometry.rle_encoding(seg)
    # starts at flat index 7 (1-based), run length 3
    assert runs == [7, 3]


def test_polygon_to_mask_and_back():
    shape = (64, 64, 3)
    poly = [(10, 10), (50, 12), (48, 40), (12, 38)]
    mask = geometry.polygon_to_mask(shape, poly)
    assert mask.sum() > 0
    bi = mask[..., 0] > 0
    polys = geometry.mask_to_polygons(bi)
    assert len(polys) >= 1
    length, ratio = geometry.min_rect_len(polys[0])
    assert length > 30


def test_mask_to_polygons_matches_cv2():
    mask = np.zeros((60, 60), np.uint8)
    mask[10:30, 15:45] = 1
    ours = geometry.mask_to_polygons(mask)
    ref, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    assert len(ours) == len(ref) == 1
    np.testing.assert_array_equal(ours[0], ref[0].reshape(-1, 2).astype(np.float32))


def test_filter_masks_prefers_elongated_centered():
    def mk(bbox, area, seg):
        return {"bbox": bbox, "area": area, "segmentation": seg, "crop_box": [0, 0, 200, 200]}

    elong = np.zeros((200, 200), bool)
    elong[95:105, 60:140] = True  # elongated, centered, area 800
    blob = np.zeros((200, 200), bool)
    blob[0:20, 0:20] = True  # corner blob, area 400
    masks = [
        mk([0, 0, 20, 20], 400, blob),
        mk([60, 95, 80, 10], 800, elong),
    ]
    best = geometry.filter_masks(masks, topn=1)
    assert best[0]["area"] == 800
