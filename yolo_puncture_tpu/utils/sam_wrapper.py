"""SAM convenience wrapper + overlay helper (yolo_seg/utils/segment_anything.py
surface: segment_anything(), show_anns())."""

from __future__ import annotations

import os
from typing import List

import numpy as np

from yolo_puncture_tpu.utils.config import get_config


def segment_anything(image: np.ndarray, model_type: str = "vit_l", device=None) -> List[dict]:
    """Run SAM automatic mask generation with the reference's settings
    (crop_n_layers=1, crop_n_points_downscale_factor=2); weights looked up at
    ``{WEIGHTS_PATH}/sam/sam_{model_type}.pth`` like the reference."""
    from yolo_puncture_tpu.models.sam import SamAutomaticMaskGenerator, sam_model_registry

    cfg = get_config()
    ckpt = os.path.join(cfg.PATH.WEIGHTS_PATH, "sam", f"sam_{model_type}.pth")
    if not os.path.exists(ckpt):
        # loud, not silent: random-weight SAM returns plausible-looking but
        # meaningless masks that would be persisted as annotations
        import sys

        print(
            f"WARNING: SAM checkpoint {ckpt} not found — generating with "
            "RANDOM weights (annotation output will be meaningless)",
            file=sys.stderr,
        )
        ckpt = None
    sam = sam_model_registry[model_type](checkpoint=ckpt)
    generator = SamAutomaticMaskGenerator(
        sam, crop_n_layers=1, crop_n_points_downscale_factor=2
    )
    return generator.generate(image)


def show_anns(frame_shape, anns, x_offset: int = 0, y_offset: int = 0) -> np.ndarray:
    """Paint SAM annotation masks into an RGB overlay with per-mask random colors
    and area labels (segment_anything.py:34-70 semantics, vectorized)."""
    import cv2

    if (not isinstance(anns, list)) and (not isinstance(anns, np.ndarray)):
        anns = [anns]
    if len(anns) == 0:
        return np.zeros(frame_shape, dtype=np.uint8)

    height, width = frame_shape[0], frame_shape[1]
    mask = np.zeros((height, width, 3), dtype=np.uint8)
    for ann in anns:
        seg = np.asarray(ann["segmentation"], bool)
        color = np.random.randint(0, 255, (3,), dtype=int)
        ys, xs = np.where(seg)
        if len(ys) == 0:
            continue
        yy = np.clip(ys + y_offset, 0, height - 1)
        xx = np.clip(xs + x_offset, 0, width - 1)
        mask[yy, xx] = color
        y_center = int(np.mean(ys) + y_offset)
        x_center = int(np.mean(xs) + x_offset)
        cv2.putText(
            mask, f"{ann['area']:.1f}", (x_center, y_center),
            cv2.FONT_HERSHEY_SIMPLEX, 1.0, (255, 255, 255), 2, cv2.LINE_AA,
        )
    return mask
