"""Annotation tooling: SAM pre-annotation, polygon→PNG masks, label QA.

Ports of dev_tools/frame_masking/get_annotations.py (SAM automatic-mask
pre-annotation filtered by the elongated-needle heuristics → pickle),
dev_tools/segmentation/convert_polygon2png.py (YOLO polygon labels → binary PNG
masks), and the non-interactive core of check_mask.py (overlay render).  The
click-driven labeler (plot_frame_masks.py) is split: its selection/save core is
headless here (``select_mask_by_point`` nearest-center pick per the mouse
callback at plot_frame_masks.py:50-66, ``save_selected_annotation`` per the
save block at :113-121); the cv2 window loop needs a display and is not
reproduced — ``filter_masks`` ranking makes selection automatic instead.
"""

from __future__ import annotations

import argparse
import os
import pickle
from typing import List, Optional

import numpy as np

from yolo_puncture_tpu.ops.geometry import filter_masks, polygon_to_mask


def sam_preannotate(
    frames_dir: str,
    output_pkl: str,
    checkpoint: Optional[str] = None,
    model_type: str = "vit_b",
    topn: int = 3,
    crop_box=None,
):
    """Generate candidate masks per frame with SAM AMG, keep the topn by the
    needle heuristics (get_annotations.py:17-49 contract)."""
    from yolo_puncture_tpu.models.sam import SamAutomaticMaskGenerator, build_sam

    from yolo_puncture_tpu.pipeline.video import sort_key

    sam = build_sam(model_type, checkpoint)
    generator = SamAutomaticMaskGenerator(
        sam, crop_n_layers=1, crop_n_points_downscale_factor=2
    )
    import cv2

    results = {}
    for fname in sorted(os.listdir(frames_dir), key=sort_key):
        if not fname.lower().endswith((".jpg", ".png", ".jpeg")):
            continue
        img = cv2.imread(os.path.join(frames_dir, fname))[..., ::-1]
        masks = generator.generate(img)
        best = filter_masks(masks, topn=topn)
        results[fname] = best
    with open(output_pkl, "wb") as f:
        pickle.dump(results, f)
    return results


def polygons_to_png(labels_dir: str, output_dir: str, width: int, height: int):
    """YOLO-format polygon labels → binary PNG masks
    (convert_polygon2png.py:5-23 contract)."""
    import cv2

    os.makedirs(output_dir, exist_ok=True)
    n = 0
    for fname in os.listdir(labels_dir):
        if not fname.endswith(".txt"):
            continue
        mask = np.zeros((height, width), np.uint8)
        with open(os.path.join(labels_dir, fname)) as f:
            for line in f:
                vals = line.split()
                if len(vals) < 7:
                    continue
                poly = np.asarray(list(map(float, vals[1:])), np.float32).reshape(-1, 2)
                poly *= np.array([width, height], np.float32)
                cv2.fillPoly(mask, [poly.astype(np.int32)], 255)
        cv2.imwrite(os.path.join(output_dir, fname.replace(".txt", ".png")), mask)
        n += 1
    return n


def render_label_overlay(image: np.ndarray, label_path: str, color=(0, 255, 0)):
    """Overlay polygon labels on an image for QA (check_mask.py:18-55 render)."""
    h, w = image.shape[:2]
    out = image.copy()
    if os.path.exists(label_path):
        with open(label_path) as f:
            for line in f:
                vals = line.split()
                if len(vals) < 7:
                    continue
                poly = np.asarray(list(map(float, vals[1:])), np.float32).reshape(-1, 2)
                poly *= np.array([w, h], np.float32)
                m = polygon_to_mask(out.shape, poly, color=color)
                out = np.clip(out.astype(np.int32) + m.astype(np.int32) // 2, 0, 255).astype(
                    np.uint8
                )
    return out


def select_mask_by_point(anns: List[dict], point) -> int:
    """Index of the annotation whose bbox center is nearest to ``point``.

    Headless core of the labeler's mouse callback (plot_frame_masks.py:50-66):
    the click selects the candidate mask with the minimum Euclidean distance
    from the click to the bbox center; ``anns`` entries carry ``bbox`` (xywh).
    """
    best, best_d = -1, float("inf")
    for idx, ann in enumerate(anns):
        x, y, w, h = ann["bbox"]
        d = (point[0] - (x + w / 2.0)) ** 2 + (point[1] - (y + h / 2.0)) ** 2
        if d < best_d:
            best, best_d = idx, d
    return best


def save_selected_annotation(
    image: np.ndarray,
    segmentation,
    video_num: int,
    frame_num: int,
    out_root: str,
    class_id: int = 0,
) -> str:
    """Persist one selected mask in the labeler's output layout
    (plot_frame_masks.py:113-121): ``images/{video}frame_{i}.jpg`` plus
    ``labels/{video}frame_{i}.txt`` holding ``{class_id} x1 y1 x2 y2 ...``
    (normalized polygon coords, the format `polygons_to_png`/the YOLO dataset
    consume).  Returns the label path.
    """
    import cv2

    os.makedirs(os.path.join(out_root, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_root, "labels"), exist_ok=True)
    stem = f"{video_num}frame_{frame_num}"
    cv2.imwrite(os.path.join(out_root, "images", stem + ".jpg"), image)
    label_path = os.path.join(out_root, "labels", stem + ".txt")
    vals = [class_id] + [float(v) for v in np.asarray(segmentation).reshape(-1)]
    with open(label_path, "w") as f:
        f.write(" ".join(map(str, vals)))
    return label_path


def tag_images(frames_dir: str, output_dir: str, text_fn=None):
    """Stamp each frame with its filename (deva_analyze/tag_img.py:7-16)."""
    import cv2

    os.makedirs(output_dir, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(frames_dir)):
        if not fname.lower().endswith((".jpg", ".png")):
            continue
        img = cv2.imread(os.path.join(frames_dir, fname))
        text = text_fn(fname) if text_fn else fname
        cv2.putText(img, text, (10, 30), cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 0, 255), 2)
        cv2.imwrite(os.path.join(output_dir, fname), img)
        n += 1
    return n


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("poly2png")
    p1.add_argument("labels_dir")
    p1.add_argument("output_dir")
    p1.add_argument("--width", type=int, required=True)
    p1.add_argument("--height", type=int, required=True)
    p2 = sub.add_parser("tag")
    p2.add_argument("frames_dir")
    p2.add_argument("output_dir")
    args = parser.parse_args(argv)
    if args.cmd == "poly2png":
        print(polygons_to_png(args.labels_dir, args.output_dir, args.width, args.height))
    else:
        print(tag_images(args.frames_dir, args.output_dir))


if __name__ == "__main__":
    main()
