"""Host-side mask geometry: min-area rectangle, contours, polygon/RLE encodings.

Behavioral contracts from yolo_seg/utils/mask_tools.py:
  * ``min_rect_len(coords)`` — length of the larger side of the minimum-area
    rotated rectangle of a polygon, plus aspect ratio; <3 points → (0, 0); zero
    short side clamps to 1 (mask_tools.py:12-22).
  * ``min_rect_len_mask(mask)`` — same over foreground pixel coordinates
    (mask_tools.py:25-37).
  * polygon → filled mask, binary mask → RGB overlay with offsets, RLE encoding,
    polygon encoding with optional normalization, ROI box+label overlay, and the
    SAM-mask scoring filter (mask_tools.py:40-169).

The min-area rectangle is a from-scratch convex-hull + rotating-calipers
implementation (exact algorithm class cv2 uses), so the framework owns its geometry;
tests cross-check against cv2.minAreaRect.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2  # host-only; drawing/contours use it when present

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


# ---------------------------------------------------------------------------
# Convex hull + rotating calipers
# ---------------------------------------------------------------------------

def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain. points (N, 2) → hull vertices CCW (M, 2)."""
    pts = np.unique(points.astype(np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort (x, then y)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross2(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    def half(iterable):
        out: List[np.ndarray] = []
        for p in iterable:
            while len(out) >= 2 and cross2(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect(points: np.ndarray) -> Tuple[Tuple[float, float], Tuple[float, float], float]:
    """Minimum-area enclosing rotated rectangle.

    Returns ((cx, cy), (w, h), angle_deg) — the cv2.minAreaRect return structure.
    Rotating calipers: the optimal rectangle has a side collinear with a hull edge.
    Uses the native C++ extension when built (same algorithm, ~10× faster on the
    per-frame path); falls back to the vectorized numpy version.
    """
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    if len(pts) >= 3:
        try:
            from yolo_puncture_tpu.native import min_area_rect_native

            res = min_area_rect_native(pts)
            if res is not None:
                return res
        except Exception:
            pass
    hull = convex_hull(pts)
    if len(hull) == 0:
        return ((0.0, 0.0), (0.0, 0.0), 0.0)
    if len(hull) == 1:
        return ((float(hull[0, 0]), float(hull[0, 1])), (0.0, 0.0), 0.0)
    if len(hull) == 2:
        d = hull[1] - hull[0]
        c = hull.mean(axis=0)
        return (
            (float(c[0]), float(c[1])),
            (float(np.hypot(*d)), 0.0),
            float(np.degrees(np.arctan2(d[1], d[0]))),
        )

    edges = np.diff(np.vstack([hull, hull[:1]]), axis=0)
    angles = np.arctan2(edges[:, 1], edges[:, 0]) % (np.pi / 2)
    angles = np.unique(angles)
    cos, sin = np.cos(angles), np.sin(angles)
    # rotation matrices (K, 2, 2): rotate by -angle
    R = np.stack([np.stack([cos, sin], -1), np.stack([-sin, cos], -1)], axis=1)
    rot = R @ hull.T[None]  # (K, 2, M)
    mins = rot.min(axis=2)
    maxs = rot.max(axis=2)
    wh = maxs - mins
    areas = wh[:, 0] * wh[:, 1]
    k = int(np.argmin(areas))
    w, h = wh[k]
    cx_r = (mins[k, 0] + maxs[k, 0]) / 2
    cy_r = (mins[k, 1] + maxs[k, 1]) / 2
    # rotate center back
    a = angles[k]
    cx = cx_r * np.cos(a) - cy_r * np.sin(a)
    cy = cx_r * np.sin(a) + cy_r * np.cos(a)
    return ((float(cx), float(cy)), (float(w), float(h)), float(np.degrees(a)))


def min_rect_len(coord_xy) -> Tuple[float, float]:
    """Long side + aspect ratio of a polygon's min-area rect (mask_tools.py:12-22).

    Points are truncated to int32 first, matching the reference's cast.
    """
    points = np.asarray(coord_xy, dtype=np.int32).reshape(-1, 2)
    if len(points) < 3:
        return 0.0, 0.0
    (_, (w, h), _) = min_area_rect(points.astype(np.float64))
    length = max(w, h)
    width = min(w, h)
    if width == 0:
        width = 1
    return float(length), float(length / width)


def min_rect_len_mask(mask_bi: np.ndarray) -> Tuple[float, float]:
    """Long side + aspect from a binary mask's foreground pixels (mask_tools.py:25-37)."""
    points = np.column_stack(np.where(mask_bi)).astype(np.int32)
    if len(points) < 3:
        return 0.0, 0.0
    (_, (w, h), _) = min_area_rect(points.astype(np.float64))
    length = max(w, h)
    width = min(w, h)
    if width == 0:
        width = 1
    return float(length), float(length / width)


# ---------------------------------------------------------------------------
# Masks ↔ polygons
# ---------------------------------------------------------------------------

def polygon_to_mask(image_shape, mask_xy, color=(255, 255, 0)) -> np.ndarray:
    """Fill a polygon into an RGB uint8 mask (get_coord_mask, mask_tools.py:40-47)."""
    mask = np.zeros(image_shape, dtype=np.uint8)
    if mask_xy is None or len(mask_xy) == 0:
        return mask
    points = np.array(mask_xy, dtype=np.int32).reshape((-1, 1, 2))
    if _HAS_CV2:
        cv2.fillPoly(mask, [points], color)
        return mask
    return _fill_poly_np(mask, points.reshape(-1, 2), color)


def _fill_poly_np(mask, pts, color):
    """Scanline polygon fill fallback."""
    h = mask.shape[0]
    ys = np.arange(h)
    x0, y0 = pts[:, 0], pts[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    for y in ys:
        cond = ((y0 <= y) & (y1 > y)) | ((y1 <= y) & (y0 > y))
        if not cond.any():
            continue
        xs = x0[cond] + (y - y0[cond]) * (x1[cond] - x0[cond]) / np.maximum(
            y1[cond] - y0[cond], 1e-9
        )
        xs = np.sort(xs)
        for i in range(0, len(xs) - 1, 2):
            a, b = int(np.ceil(xs[i])), int(np.floor(xs[i + 1]))
            if b >= a:
                mask[y, a : b + 1] = color
    return mask


def binary_mask_overlay(
    img_shape, mask_bi, x_offset: int = 0, y_offset: int = 0, color=(255, 255, 0)
) -> np.ndarray:
    """Paint binary-mask pixels into an RGB overlay (get_bi_mask, mask_tools.py:50-64)."""
    mask = np.zeros(img_shape, dtype=np.uint8)
    if mask_bi is None or np.size(mask_bi) == 0:
        return mask
    y_idx, x_idx = np.nonzero(mask_bi)
    y_idx = np.clip(y_idx + y_offset, 0, img_shape[0] - 1)
    x_idx = np.clip(x_idx + x_offset, 0, img_shape[1] - 1)
    mask[y_idx, x_idx] = color
    return mask


def mask_to_polygons(binary_mask: np.ndarray, largest_only: bool = False):
    """Extract outer contours as float32 (x, y) polygons (masks.xy contract).

    Uses cv2.findContours(RETR_EXTERNAL, CHAIN_APPROX_SIMPLE) for pixel-exact parity
    with the reference predict API; falls back to marching-squares tracing.
    """
    m = (np.asarray(binary_mask) > 0).astype(np.uint8)
    if _HAS_CV2:
        contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        polys = [c.reshape(-1, 2).astype(np.float32) for c in contours]
    else:
        polys = None
        if largest_only:
            # cv2-absent fast path: C++ Moore tracer (outer border of the
            # largest component — exactly the largest_only contract)
            try:
                from yolo_puncture_tpu.native import largest_contour_native

                c = largest_contour_native(m)
                if c is not None and len(c):
                    polys = [c.astype(np.float32)]
            except Exception:
                polys = None
        if polys is None:
            polys = _trace_contours_np(m)
    if not polys:
        return [] if not largest_only else np.zeros((0, 2), np.float32)
    if largest_only:
        return max(polys, key=len)
    return polys


def _trace_contours_np(m: np.ndarray):
    """Moore-neighbor border following (fallback)."""
    from scipy import ndimage  # baked-in

    labeled, n = ndimage.label(m)
    polys = []
    # 8-neighbour clockwise order starting east
    nbrs = [(0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1)]
    for lab in range(1, n + 1):
        ys, xs = np.where(labeled == lab)
        if len(ys) == 0:
            continue
        start = (ys[np.argmin(ys * m.shape[1] + xs)], xs[np.argmin(ys * m.shape[1] + xs)])
        comp = labeled == lab
        contour = [start]
        prev_dir = 4  # came from west
        cur = start
        for _ in range(4 * len(ys) + 8):
            found = False
            for i in range(8):
                d = (prev_dir + 6 + i) % 8
                ny, nx = cur[0] + nbrs[d][0], cur[1] + nbrs[d][1]
                if 0 <= ny < m.shape[0] and 0 <= nx < m.shape[1] and comp[ny, nx]:
                    cur = (ny, nx)
                    prev_dir = d
                    contour.append(cur)
                    found = True
                    break
            if not found or cur == start:
                break
        polys.append(np.array([(x, y) for y, x in contour], dtype=np.float32))
    return polys


# ---------------------------------------------------------------------------
# Encodings
# ---------------------------------------------------------------------------

def rle_encoding(binary_segment: np.ndarray) -> list:
    """Binary mask → RLE run list (mask_tools.py:67-73 semantics)."""
    try:
        from yolo_puncture_tpu.native import rle_encode_native

        out = rle_encode_native(binary_segment)
        if out is not None:
            return out
    except Exception:
        pass
    return _rle_encoding_np(binary_segment)


def _rle_encoding_np(binary_segment: np.ndarray) -> list:
    """Pure-numpy RLE (the parity reference the native encoder is tested against)."""
    pixels = np.asarray(binary_segment).flatten()
    pixels = np.concatenate([[0], pixels, [0]])
    runs = np.where(pixels[1:] != pixels[:-1])[0] + 1
    runs[1::2] -= runs[::2]
    return runs.tolist()


def polygon_encoding(binary_segment: np.ndarray, normalize: bool = True) -> list:
    """Binary mask → flat polygon coordinate list (mask_tools.py:76-97 semantics)."""
    seg = np.asarray(binary_segment).astype(np.uint8)
    polys = mask_to_polygons(seg)
    h, w = seg.shape[:2]
    out: List[float] = []
    for contour in polys:
        pts = [(float(x), float(y)) for x, y in contour]
        if normalize:
            pts = [
                (round(min(1.0, max(0.0, x / w)), 6), round(min(1.0, max(0.0, y / h)), 6))
                for x, y in pts
            ]
        out.extend([c for p in pts for c in p])
    return out


def create_roi_mask(frame_shape, x1, y1, x2, y2, label: str) -> np.ndarray:
    """Blue ROI rectangle + label overlay (mask_tools.py:100-129)."""
    height, width = frame_shape[0], frame_shape[1]
    mask = np.zeros((height, width, 3), dtype=np.uint8)
    color = (0, 0, 255)
    if _HAS_CV2:
        cv2.rectangle(mask, (int(x1), int(y1)), (int(x2), int(y2)), color, 2)
        if label:
            font = cv2.FONT_HERSHEY_COMPLEX
            text_size = cv2.getTextSize(label, font, 1, 2)[0]
            text_y = y1 - 10 if y1 - 10 > 10 else y1 + 10 + text_size[1]
            cv2.putText(mask, label, (int(x1), int(text_y)), font, 1, color, 2, cv2.LINE_AA)
    else:
        x1, y1 = max(0, int(x1)), max(0, int(y1))
        x2, y2 = min(width - 1, int(x2)), min(height - 1, int(y2))
        mask[y1 : y1 + 2, x1:x2] = color
        mask[y2 - 1 : y2 + 1, x1:x2] = color
        mask[y1:y2, x1 : x1 + 2] = color
        mask[y1:y2, x2 - 1 : x2 + 1] = color
    return mask


def filter_masks(masks: Sequence[dict], topn: int = 1) -> Optional[list]:
    """Score-and-rank SAM candidate masks (mask_tools.py:132-169 heuristics):
    aspect ratio ↑, center proximity ↑, area in [300, 3000], straddles midline ↑."""
    if len(masks) == 0:
        return None
    crop_box = masks[0]["crop_box"]
    total_area = (crop_box[2] - crop_box[0]) * (crop_box[3] - crop_box[1])
    scores = [0.0] * len(masks)
    for idx, mask in enumerate(masks):
        bbox = mask["bbox"]  # xywh
        area = mask["area"]
        _, ratio = min_rect_len_mask(mask["segmentation"])
        scores[idx] += ratio
        distance = np.sqrt(
            ((bbox[0] + bbox[2] / 2) - ((crop_box[0] + crop_box[2]) / 2)) ** 2
            + ((bbox[1] + bbox[3] / 2) - ((crop_box[1] + crop_box[3]) / 2)) ** 2
        )
        scores[idx] += 2 * 1000 / max(distance, 1e-9)
        scores[idx] += 5 - area / total_area * 100
        if area < 300 or area > 3000:
            scores[idx] -= 100
        mid = (crop_box[0] + crop_box[2]) / 2
        if (bbox[0] < mid) and (bbox[0] + bbox[2] > mid):
            scores[idx] += 30
    topn_indices = np.argsort(scores)[-topn:]
    return [masks[i] for i in topn_indices][::-1]
