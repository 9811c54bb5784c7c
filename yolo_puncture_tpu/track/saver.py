"""ResultSaver — the DEVA result-saving surface (yolo_with_deva.py:252-262 usage;
SURVEY.md §2.2 'DEVA support API').

save_mask(prob, name, need_resize, shape, image_np) paints the argmax id mask to
an RGB PNG (deterministic id→rgb palette, np.random.seed(42) convention of
yolo_with_deva.py:215), appends annotation entries to ``video_json``; ``end()``
finalizes.  ``flush_buffer`` drains a tracker's semionline buffer.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def _id_palette(n: int = 256, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 255, size=(n, 3), dtype=np.uint8)
    pal[0] = 0
    return pal


class ResultSaver:
    def __init__(
        self,
        output_root: str,
        video_name: str,
        dataset: str = "demo",
        object_manager=None,
    ):
        self.output_root = output_root
        self.video_name = video_name
        self.dataset = dataset
        self.object_manager = object_manager
        self.palette = _id_palette()
        self.video_json = {"video": video_name, "annotations": []}
        self.mask_dir = os.path.join(output_root, "Annotations", video_name)
        os.makedirs(self.mask_dir, exist_ok=True)

    def save_mask(
        self,
        prob: np.ndarray,
        frame_name: str,
        need_resize: bool = False,
        shape: Optional[Tuple[int, int]] = None,
        image_np: Optional[np.ndarray] = None,
    ):
        """prob: (No+1, H, W) softmax — channel 0 is background."""
        import cv2

        prob = np.asarray(prob)
        idx_mask = np.argmax(prob, axis=0).astype(np.int32)  # 0 = bg, k = slot k-1+1
        if need_resize and shape is not None:
            idx_mask = cv2.resize(
                idx_mask, (shape[1], shape[0]), interpolation=cv2.INTER_NEAREST
            )
        rgb = self.palette[idx_mask % len(self.palette)]
        out_path = os.path.join(self.mask_dir, os.path.splitext(frame_name)[0] + ".png")
        cv2.imwrite(out_path, rgb[..., ::-1])

        segments = []
        for slot_id in np.unique(idx_mask):
            if slot_id == 0:
                continue
            info = None
            if self.object_manager is not None:
                info = self.object_manager.slot_to_info.get(int(slot_id) - 1)
            segments.append(
                {
                    "id": int(info.id) if info else int(slot_id),
                    "category_id": int(info.category_id) if info else 0,
                    "area": int((idx_mask == slot_id).sum()),
                }
            )
        self.video_json["annotations"].append(
            {"file_name": frame_name, "segments_info": segments}
        )

    def end(self):
        return self.video_json


def flush_buffer(tracker, result_saver: ResultSaver):
    """Drain remaining semionline buffer frames through plain propagation
    (deva.inference.demo_utils.flush_buffer contract)."""
    for frame_info in tracker.frame_buffer:
        prob = tracker.step(frame_info.image, None, None)
        h, w = frame_info.info["shape"]
        result_saver.save_mask(
            prob, frame_info.name, need_resize=True, shape=(h, w),
            image_np=frame_info.image_np,
        )
    tracker.clear_buffer()


def get_input_frame_for_deva(image_np: np.ndarray, min_side: int) -> np.ndarray:
    """Resize min side (deva.inference.demo_utils contract, yolo_with_deva.py:120)."""
    import cv2

    if min_side <= 0:
        return image_np
    h, w = image_np.shape[:2]
    scale = min_side / min(h, w)
    return cv2.resize(image_np, (int(w * scale), int(h * scale)))
