#!/usr/bin/env python
"""Interactive annotation front-ends over the headless cores in
tools/annotation.py (VERDICT.md round-1 item 9).

Three human-in-the-loop tools, ports of the reference's interactive scripts:

* ``label``  — click-to-select mask labeler
  (dev_tools/frame_masking/plot_frame_masks.py:68-133): shows each frame with
  its SAM candidate masks (from the pre-annotation pickle); click picks the
  nearest-center candidate (select_mask_by_point), ``s`` saves the YOLO polygon
  label (save_selected_annotation), ``n``/``p`` navigate, ``q`` quits.
* ``check``  — keyboard label-QA viewer
  (dev_tools/frame_masking/check_mask.py:18-55): overlays each saved label on
  its frame (render_label_overlay); ``y``/``n`` keep or delete the label file,
  ``q`` quits.
* ``measure`` — interactive two-point pixel distance
  (dev_tools/video_tools/two_point_dis.py): two clicks print and draw the
  distance; ``c`` clears, ``q`` quits.

Each tool is a small class whose ``on_click``/``on_key`` handlers take plain
matplotlib events, so the logic is drivable headlessly (tests) and
interactively (``python tools/annotation_ui.py label --frames ... --anns ...``).
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import sys
from typing import List, Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.annotation import (  # noqa: E402
    render_label_overlay,
    save_selected_annotation,
    select_mask_by_point,
)


def _sorted_frames(frames_dir: str) -> List[str]:
    from yolo_puncture_tpu.pipeline.video import sort_key

    names = [
        f for f in os.listdir(frames_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    ]
    return [os.path.join(frames_dir, f) for f in sorted(names, key=sort_key)]


class MaskLabeler:
    """Click-to-select SAM-candidate labeler (plot_frame_masks semantics)."""

    def __init__(self, frames: List[str], anns: dict, labels_dir: str,
                 class_id: int = 0, fig=None):
        import matplotlib.pyplot as plt

        self.frames = frames
        self.anns = anns              # {frame_basename: [sam mask dicts]}
        self.labels_dir = labels_dir
        self.class_id = class_id
        self.idx = 0
        self.selected: Optional[int] = None
        self.saved = []               # label paths written this session
        os.makedirs(labels_dir, exist_ok=True)
        self.fig = fig or plt.figure(figsize=(9, 6))
        self.ax = self.fig.add_subplot(111)
        self.fig.canvas.mpl_connect("button_press_event", self.on_click)
        self.fig.canvas.mpl_connect("key_press_event", self.on_key)
        self._draw()

    # -- state ----------------------------------------------------------
    def _frame_anns(self):
        return self.anns.get(os.path.basename(self.frames[self.idx]), [])

    def _draw(self):
        import cv2

        self.ax.clear()
        img = cv2.imread(self.frames[self.idx])[:, :, ::-1].copy()
        overlay = img.copy()
        for i, m in enumerate(self._frame_anns()):
            color = (255, 40, 40) if i == self.selected else (40, 220, 40)
            overlay[m["segmentation"]] = color
        img = (0.55 * img + 0.45 * overlay).astype(np.uint8)
        self.ax.imshow(img)
        sel = "none" if self.selected is None else str(self.selected)
        self.ax.set_title(
            f"[{self.idx + 1}/{len(self.frames)}] "
            f"{os.path.basename(self.frames[self.idx])} — "
            f"click: select | s: save | n/p: nav | q: quit (sel {sel})"
        )
        self.fig.canvas.draw_idle()

    # -- handlers -------------------------------------------------------
    def on_click(self, event):
        if event.xdata is None or event.ydata is None:
            return
        anns = self._frame_anns()
        if not anns:
            return
        self.selected = select_mask_by_point(anns, (event.xdata, event.ydata))
        self._draw()

    def on_key(self, event):
        if event.key == "s" and self.selected is not None:
            import cv2

            from yolo_puncture_tpu.ops.geometry import mask_to_polygons
            from yolo_puncture_tpu.pipeline.video import sort_key

            anns = self._frame_anns()
            frame_path = self.frames[self.idx]
            img = cv2.imread(frame_path)
            m = np.asarray(anns[self.selected]["segmentation"], np.uint8)
            poly = mask_to_polygons(m, largest_only=True)  # (N, 2) pixel coords
            h, w = m.shape
            norm = np.stack([poly[:, 0] / w, poly[:, 1] / h], -1)
            vid, fr = sort_key(os.path.basename(frame_path))
            path = save_selected_annotation(
                img, norm, vid, fr, self.labels_dir, class_id=self.class_id
            )
            self.saved.append(path)
            self._advance(1)
        elif event.key == "n":
            self._advance(1)
        elif event.key == "p":
            self._advance(-1)
        elif event.key == "q":
            import matplotlib.pyplot as plt

            plt.close(self.fig)

    def _advance(self, d):
        self.idx = int(np.clip(self.idx + d, 0, len(self.frames) - 1))
        self.selected = None
        self._draw()


class LabelChecker:
    """Keyboard QA loop over saved labels (check_mask.py:18-55 semantics)."""

    def __init__(self, frames: List[str], labels_dir: str, fig=None):
        import matplotlib.pyplot as plt

        self.pairs = []
        for f in frames:
            lp = os.path.join(
                labels_dir, os.path.splitext(os.path.basename(f))[0] + ".txt"
            )
            if os.path.exists(lp):
                self.pairs.append((f, lp))
        self.idx = 0
        self.deleted = []
        self.kept = []
        self.fig = fig or plt.figure(figsize=(9, 6))
        self.ax = self.fig.add_subplot(111)
        self.fig.canvas.mpl_connect("key_press_event", self.on_key)
        if self.pairs:
            self._draw()

    def _draw(self):
        import cv2

        frame, label = self.pairs[self.idx]
        img = cv2.imread(frame)[:, :, ::-1].copy()
        img = render_label_overlay(img, label)
        self.ax.clear()
        self.ax.imshow(img)
        self.ax.set_title(
            f"[{self.idx + 1}/{len(self.pairs)}] {os.path.basename(label)} — "
            "y: keep | n: DELETE label | q: quit"
        )
        self.fig.canvas.draw_idle()

    def on_key(self, event):
        if not self.pairs:
            return
        frame, label = self.pairs[self.idx]
        if event.key == "y":
            self.kept.append(label)
            self._advance()
        elif event.key == "n":
            os.remove(label)
            self.deleted.append(label)
            self._advance()
        elif event.key == "q":
            import matplotlib.pyplot as plt

            plt.close(self.fig)

    def _advance(self):
        if self.idx + 1 < len(self.pairs):
            self.idx += 1
            self._draw()
        else:
            import matplotlib.pyplot as plt

            plt.close(self.fig)


class TwoPointMeasure:
    """Two clicks → pixel distance (two_point_dis.py semantics)."""

    def __init__(self, image: np.ndarray, fig=None):
        import matplotlib.pyplot as plt

        self.image = image
        self.points: List = []
        self.distances: List[float] = []
        self.fig = fig or plt.figure(figsize=(9, 6))
        self.ax = self.fig.add_subplot(111)
        self.fig.canvas.mpl_connect("button_press_event", self.on_click)
        self.fig.canvas.mpl_connect("key_press_event", self.on_key)
        self._draw()

    def _draw(self):
        self.ax.clear()
        self.ax.imshow(self.image[:, :, ::-1] if self.image.ndim == 3 else self.image)
        for x, y in self.points:
            self.ax.plot(x, y, "r+", markersize=12)
        if len(self.points) == 2:
            (x1, y1), (x2, y2) = self.points
            self.ax.plot([x1, x2], [y1, y2], "r-")
            self.ax.set_title(f"distance: {self.distances[-1]:.2f} px — c: clear | q: quit")
        else:
            self.ax.set_title("click two points — c: clear | q: quit")
        self.fig.canvas.draw_idle()

    def on_click(self, event):
        if event.xdata is None or event.ydata is None:
            return
        if len(self.points) == 2:
            self.points = []
        self.points.append((float(event.xdata), float(event.ydata)))
        if len(self.points) == 2:
            (x1, y1), (x2, y2) = self.points
            d = float(np.hypot(x2 - x1, y2 - y1))
            self.distances.append(d)
            print(f"distance: {d:.2f} px")
        self._draw()

    def on_key(self, event):
        if event.key == "c":
            self.points = []
            self._draw()
        elif event.key == "q":
            import matplotlib.pyplot as plt

            plt.close(self.fig)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("label", help="click-to-select SAM mask labeler")
    pl.add_argument("--frames", required=True)
    pl.add_argument("--anns", required=True, help="pickle from sam_preannotate")
    pl.add_argument("--labels", required=True, help="output YOLO label dir")
    pl.add_argument("--class_id", type=int, default=0)

    pc = sub.add_parser("check", help="label QA viewer")
    pc.add_argument("--frames", required=True)
    pc.add_argument("--labels", required=True)

    pm = sub.add_parser("measure", help="two-point pixel distance")
    pm.add_argument("--image", required=True)

    args = p.parse_args(argv)
    import matplotlib.pyplot as plt

    if args.cmd == "label":
        with open(args.anns, "rb") as f:
            anns = pickle.load(f)
        MaskLabeler(_sorted_frames(args.frames), anns, args.labels, args.class_id)
    elif args.cmd == "check":
        LabelChecker(_sorted_frames(args.frames), args.labels)
    else:
        import cv2

        TwoPointMeasure(cv2.imread(args.image))
    plt.show()


if __name__ == "__main__":
    main()
