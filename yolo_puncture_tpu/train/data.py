"""Dataset loading for YOLO-format segmentation fine-tuning.

Reads the ultralytics dataset layout the reference trains on
(docs/quickstart.md train contract; labels are ``class x1 y1 x2 y2 …`` normalized
polygons per line): images/{split}/*.jpg + labels/{split}/*.txt, or an
images/labels sibling-dir pair.  Produces fixed-shape batches:
  images   (B, S, S, 3) float letterboxed
  gt_labels(B, M) int32, gt_bboxes (B, M, 4) xyxy px, mask_gt (B, M)
  gt_masks (B, M, S/4, S/4) float rasterized polygons at proto resolution
"""

from __future__ import annotations

import os
import random
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from yolo_puncture_tpu.ops.letterbox import letterbox_params


def _find_pairs(root: str, split: str) -> List[Tuple[str, str]]:
    img_dir = None
    for cand in (
        os.path.join(root, "images", split),
        os.path.join(root, split, "images"),
        os.path.join(root, "images"),
        root,
    ):
        if os.path.isdir(cand):
            img_dir = cand
            break
    if img_dir is None:
        raise FileNotFoundError(f"no images dir under {root}")
    pairs = []
    for f in sorted(os.listdir(img_dir)):
        if not f.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        img_path = os.path.join(img_dir, f)
        lbl_path = (
            img_path.replace(f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}")
            .rsplit(".", 1)[0]
            + ".txt"
        )
        pairs.append((img_path, lbl_path if os.path.exists(lbl_path) else ""))
    return pairs


def _parse_label(path: str) -> List[Tuple[int, np.ndarray]]:
    """Each line: class x1 y1 x2 y2 ... (normalized polygon)."""
    out = []
    if not path or not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            vals = line.split()
            if len(vals) < 7:
                continue
            cls = int(float(vals[0]))
            poly = np.asarray(list(map(float, vals[1:])), np.float32).reshape(-1, 2)
            out.append((cls, poly))
    return out


def _rasterize(poly_px: np.ndarray, h: int, w: int) -> np.ndarray:
    try:
        import cv2

        m = np.zeros((h, w), np.uint8)
        cv2.fillPoly(m, [poly_px.astype(np.int32)], 1)
        return m.astype(np.float32)
    except ImportError:  # pragma: no cover
        from yolo_puncture_tpu.ops.geometry import _fill_poly_np

        m = np.zeros((h, w, 1), np.uint8)
        _fill_poly_np(m, poly_px.astype(np.int32), (1,))
        return m[..., 0].astype(np.float32)


class SegDataset:
    def __init__(
        self,
        root: str,
        split: str = "train",
        imgsz: int = 640,
        max_boxes: int = 32,
        augment: bool = True,
        seed: int = 0,
    ):
        self.pairs = _find_pairs(root, split)
        self.imgsz = imgsz
        self.max_boxes = max_boxes
        self.augment = augment
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.pairs)

    def load(self, idx: int, flip: bool = False) -> Dict[str, np.ndarray]:
        import cv2

        img_path, lbl_path = self.pairs[idx]
        img = cv2.imread(img_path)
        h0, w0 = img.shape[:2]
        S = self.imgsz
        r, (nw, nh), (left, top) = letterbox_params(h0, w0, S)
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.full((S, S, 3), 114, np.uint8)
        canvas[top : top + nh, left : left + nw] = resized

        labels = _parse_label(lbl_path)
        M = self.max_boxes
        gt_labels = np.zeros(M, np.int32)
        gt_bboxes = np.zeros((M, 4), np.float32)
        mask_gt = np.zeros(M, bool)
        Hp = Wp = S // 4
        gt_masks = np.zeros((M, Hp, Wp), np.float32)

        if flip:
            canvas = canvas[:, ::-1].copy()

        for i, (cls, poly) in enumerate(labels[:M]):
            poly_px = poly * np.array([w0, h0], np.float32)
            poly_lb = poly_px * r + np.array([left, top], np.float32)
            if flip:
                poly_lb[:, 0] = S - poly_lb[:, 0]
            x1, y1 = poly_lb.min(0)
            x2, y2 = poly_lb.max(0)
            gt_labels[i] = cls
            gt_bboxes[i] = (x1, y1, x2, y2)
            mask_gt[i] = True
            gt_masks[i] = _rasterize(poly_lb / 4.0, Hp, Wp)

        # BGR→RGB + /255 (device path does this for inference; match here)
        images = canvas[..., ::-1].astype(np.float32) / 255.0
        return {
            "images": images,
            "gt_labels": gt_labels,
            "gt_bboxes": gt_bboxes,
            "mask_gt": mask_gt,
            "gt_masks": gt_masks,
        }

    def batches(self, batch_size: int, shuffle: bool = True) -> Iterator[Dict]:
        order = list(range(len(self)))
        if shuffle:
            self.rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            items = [
                self.load(j, flip=self.augment and self.rng.random() < 0.5)
                for j in order[i : i + batch_size]
            ]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
