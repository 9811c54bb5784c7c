"""Ultralytics-compatible result objects.

API contract (SURVEY.md §2.2 'YOLO predict API', usage sites yolo_seg/app.py:91-101,
dev_tools/auto_speed_calc.py:62-71, yolo_seg/yolo_with_deva.py:51-87):
  results[0].boxes.cls / .conf / .xyxy / .xywh / .xywhn, .cpu().numpy() chaining;
  results[0].masks.xy (per-instance polygons in original-image coords) and
  .masks.data (per-instance H×W masks).

Everything is host-side numpy; device arrays are materialized once per frame batch.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from yolo_puncture_tpu.ops.geometry import mask_to_polygons


class Boxes:
    """Detected boxes; mirrors ultralytics Boxes (torch-free)."""

    def __init__(self, xyxy: np.ndarray, conf: np.ndarray, cls: np.ndarray, orig_shape):
        self._xyxy = np.asarray(xyxy, dtype=np.float32).reshape(-1, 4)
        self.conf = np.asarray(conf, dtype=np.float32).reshape(-1)
        self.cls = np.asarray(cls, dtype=np.float32).reshape(-1)
        self.orig_shape = orig_shape  # (h, w)

    @property
    def xyxy(self) -> np.ndarray:
        return self._xyxy

    @property
    def xywh(self) -> np.ndarray:
        b = self._xyxy
        wh = b[:, 2:] - b[:, :2]
        c = (b[:, 2:] + b[:, :2]) / 2
        return np.concatenate([c, wh], axis=1)

    @property
    def xyxyn(self) -> np.ndarray:
        h, w = self.orig_shape
        return self._xyxy / np.array([w, h, w, h], dtype=np.float32)

    @property
    def xywhn(self) -> np.ndarray:
        h, w = self.orig_shape
        return self.xywh / np.array([w, h, w, h], dtype=np.float32)

    @property
    def data(self) -> np.ndarray:
        return np.concatenate(
            [self._xyxy, self.conf[:, None], self.cls[:, None]], axis=1
        )

    def cpu(self):
        return self

    def numpy(self):
        return self

    def __len__(self):
        return len(self.conf)

    def __getitem__(self, i):
        return Boxes(self._xyxy[i], self.conf[i], self.cls[i], self.orig_shape)


class Masks:
    """Instance masks; .data (N, H, W) float {0,1}, .xy per-instance polygons."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, dtype=np.float32)
        self.orig_shape = orig_shape
        self._xy: Optional[List[np.ndarray]] = None

    @property
    def xy(self) -> List[np.ndarray]:
        """Largest outer contour per instance, float32 (x, y) in original coords
        (ultralytics masks2segments strategy='largest')."""
        if self._xy is None:
            out = []
            for m in self.data:
                polys = mask_to_polygons(m > 0.5)
                if polys:
                    out.append(max(polys, key=len))
                else:
                    out.append(np.zeros((0, 2), dtype=np.float32))
            self._xy = out
        return self._xy

    @property
    def xyn(self) -> List[np.ndarray]:
        h, w = self.orig_shape
        return [p / np.array([w, h], np.float32) for p in self.xy]

    def cpu(self):
        return self

    def numpy(self):
        return self

    def __len__(self):
        return len(self.data)


class Results:
    """Per-image prediction result (ultralytics Results surface)."""

    def __init__(
        self,
        orig_img: Optional[np.ndarray],
        boxes: Boxes,
        masks: Optional[Masks] = None,
        names: Optional[dict] = None,
        speed: Optional[dict] = None,
        path: str = "",
    ):
        self.orig_img = orig_img
        self.orig_shape = boxes.orig_shape
        self.boxes = boxes
        self.masks = masks
        self.names = names or {}
        self.speed = speed or {}
        self.path = path

    def __len__(self):
        return len(self.boxes)

    def plot(self, line_width: int = 2, alpha: float = 0.4) -> np.ndarray:
        """Annotated BGR image: boxes + mask overlays (host, cv2 when available)."""
        img = (
            self.orig_img.copy()
            if self.orig_img is not None
            else np.zeros((*self.orig_shape, 3), np.uint8)
        )
        rng = np.random.default_rng(7)
        colors = rng.integers(64, 255, size=(max(len(self.boxes), 1), 3))
        if self.masks is not None:
            for i, m in enumerate(self.masks.data):
                col = colors[i % len(colors)]
                sel = m > 0.5
                img[sel] = (img[sel] * (1 - alpha) + col * alpha).astype(np.uint8)
        try:
            import cv2

            for i in range(len(self.boxes)):
                x1, y1, x2, y2 = self.boxes.xyxy[i].astype(int)
                col = tuple(int(c) for c in colors[i % len(colors)])
                cv2.rectangle(img, (x1, y1), (x2, y2), col, line_width)
                cls_id = int(self.boxes.cls[i])
                label = f"{self.names.get(cls_id, cls_id)} {self.boxes.conf[i]:.2f}"
                cv2.putText(
                    img, label, (x1, max(12, y1 - 4)), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, col, 1, cv2.LINE_AA,
                )
        except ImportError:
            pass
        return img
