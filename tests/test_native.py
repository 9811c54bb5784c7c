"""Native C++ geometry vs cv2/numpy references."""

import cv2
import numpy as np
import pytest

from yolo_puncture_tpu.native import (
    get_lib,
    largest_contour_native,
    min_area_rect_native,
    rle_encode_native,
)
from yolo_puncture_tpu.ops import geometry

pytestmark = pytest.mark.skipif(get_lib() is None, reason="g++ build unavailable")

rng = np.random.default_rng(3)


@pytest.mark.parametrize("trial", range(10))
def test_native_min_area_rect_matches_cv2(trial):
    rng = np.random.default_rng(500 + trial)  # per-trial: reproducible alone
    n = int(rng.integers(3, 50))
    pts = rng.uniform(0, 300, size=(n, 2)).astype(np.int32)
    res = min_area_rect_native(pts.astype(np.float64))
    (_, (w1, h1), _) = res
    (_, (w2, h2), _) = cv2.minAreaRect(pts)
    # minimum AREA is unique; the (w, h) split can differ on exact-tie inputs
    assert w1 * h1 == pytest.approx(w2 * h2, rel=1e-6, abs=1e-3)


def test_native_contour_covers_mask_boundary():
    mask = np.zeros((40, 60), np.uint8)
    mask[10:30, 15:45] = 1
    c = largest_contour_native(mask)
    assert c is not None and len(c) >= 4
    # all contour points lie on the rectangle border
    xs, ys = c[:, 0], c[:, 1]
    assert xs.min() == 15 and xs.max() == 44
    assert ys.min() == 10 and ys.max() == 29
    # min-rect length from the native contour matches the mask geometry
    length, _ = geometry.min_rect_len(c.astype(np.float32))
    assert length == pytest.approx(29, abs=1.0)


def test_native_rle_matches_python():
    seg = (rng.uniform(size=(17, 23)) > 0.6).astype(np.uint8)
    ours = rle_encode_native(seg)
    # compare against the PURE-numpy reference (rle_encoding itself now
    # prefers the native path, so it can no longer serve as the oracle)
    ref = geometry._rle_encoding_np(seg)
    assert ours == ref


def test_native_contour_ignores_hole_borders():
    """A filled square with a comb-shaped hole: the traced contour must be the
    OUTER boundary, not the (longer) hole border (reproduced defect)."""
    mask = np.ones((50, 50), np.uint8)
    # comb hole: long horizontal slot with teeth, interior only
    mask[10:40, 10:40] = 0
    mask[10:40, 12:14] = 1
    mask[10:40, 20:22] = 1
    mask[10:40, 30:32] = 1
    # teeth reconnect to the body at the top so the hole is one region
    c = largest_contour_native(mask)
    assert c is not None and len(c)
    xs, ys = c[:, 0], c[:, 1]
    # the outer boundary of the full 50x50 square
    assert xs.min() == 0 and xs.max() == 49 and ys.min() == 0 and ys.max() == 49
    # every contour point is ON the image border (the true external contour)
    on_border = (xs == 0) | (xs == 49) | (ys == 0) | (ys == 49)
    assert on_border.all()


def test_native_contour_serpentine_not_truncated():
    """Serpentine mask with an O(h*w) boundary: returned contour must be the
    complete loop, never a silent truncation (reproduced defect)."""
    h = w = 60
    mask = np.zeros((h, w), np.uint8)
    for i in range(0, h, 4):
        mask[i:i + 2, 2:w - 2] = 1
        if (i // 4) % 2 == 0:
            mask[i:i + 4, w - 4:w - 2] = 1
        else:
            mask[i:i + 4, 2:4] = 1
    c = largest_contour_native(mask)
    assert c is not None
    import cv2

    contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    ref = max(contours, key=len).reshape(-1, 2)
    # same boundary pixel SET as cv2's external contour (traversal order and
    # revisit counts may differ)
    assert set(map(tuple, c.tolist())) == set(map(tuple, ref.tolist()))


def test_native_rle_empty_and_full():
    assert rle_encode_native(np.zeros((4, 4), np.uint8)) == []
    assert rle_encode_native(np.ones(5, np.uint8)) == [1, 5]


def test_native_contour_start_pixel_cut_vertex():
    """Jacob stopping criterion: a boundary that passes through the start
    pixel twice (thin spur at the topmost-leftmost pixel) must not truncate
    (reproduced defect: a 2-point contour omitting the spur)."""
    mask = np.zeros((3, 4), np.uint8)
    mask[0, 1] = mask[0, 2] = mask[1, 0] = 1
    c = largest_contour_native(mask)
    pts = set(map(tuple, c.tolist()))
    assert {(1, 0), (2, 0), (0, 1)} <= pts, pts  # all three pixels present (xy)
