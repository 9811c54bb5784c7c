"""Interactive annotation front-ends, driven headlessly (Agg backend) with
synthetic matplotlib events — proves a human can select a SAM mask and save a
label end-to-end (VERDICT.md round-1 item 9).  Reference loops:
plot_frame_masks.py:68-133, check_mask.py:18-55, two_point_dis.py.
"""

import os
import pickle

import matplotlib

matplotlib.use("Agg")

import cv2
import numpy as np
import pytest


class _Ev:
    """Minimal stand-in for a matplotlib Event."""

    def __init__(self, key=None, xdata=None, ydata=None):
        self.key = key
        self.xdata = xdata
        self.ydata = ydata


@pytest.fixture()
def frames_and_anns(tmp_path):
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    anns = {}
    for i in range(2):
        img = np.zeros((60, 80, 3), np.uint8)
        cv2.rectangle(img, (10, 10), (30, 26), (200, 200, 200), -1)
        cv2.rectangle(img, (50, 30), (70, 50), (120, 160, 220), -1)
        name = f"1frame_{i}.jpg"
        cv2.imwrite(str(frames_dir / name), img)
        m1 = np.zeros((60, 80), bool)
        m1[10:27, 10:31] = True
        m2 = np.zeros((60, 80), bool)
        m2[30:51, 50:71] = True
        anns[name] = [
            {"segmentation": m1, "bbox": [10, 10, 21, 17], "area": int(m1.sum())},
            {"segmentation": m2, "bbox": [50, 30, 21, 21], "area": int(m2.sum())},
        ]
    return str(frames_dir), anns


def test_mask_labeler_click_select_save(frames_and_anns, tmp_path):
    from tools.annotation_ui import MaskLabeler, _sorted_frames

    frames_dir, anns = frames_and_anns
    out_root = str(tmp_path / "out")
    ui = MaskLabeler(_sorted_frames(frames_dir), anns, out_root)

    # click near the SECOND candidate's center → selects index 1
    ui.on_click(_Ev(xdata=61, ydata=41))
    assert ui.selected == 1
    # click near the first → selects index 0
    ui.on_click(_Ev(xdata=20, ydata=18))
    assert ui.selected == 0

    ui.on_key(_Ev(key="s"))  # save + advance
    assert len(ui.saved) == 1 and ui.idx == 1 and ui.selected is None
    label_path = ui.saved[0]
    assert os.path.exists(label_path)
    vals = [float(v) for v in open(label_path).read().split()]
    assert vals[0] == 0.0  # class id
    coords = np.array(vals[1:]).reshape(-1, 2)
    assert len(coords) >= 3
    assert (coords >= 0).all() and (coords <= 1).all()
    # polygon covers the first box region (normalized)
    assert 0.1 <= coords[:, 0].min() <= 0.2 and 0.3 <= coords[:, 0].max() <= 0.45
    # paired image written in the {video}frame_{i} layout
    assert os.path.exists(os.path.join(out_root, "images", "1frame_0.jpg"))

    # navigation clamps
    ui.on_key(_Ev(key="n"))
    assert ui.idx == 1
    ui.on_key(_Ev(key="p"))
    assert ui.idx == 0


def test_label_checker_keep_and_delete(frames_and_anns, tmp_path):
    from tools.annotation_ui import LabelChecker, MaskLabeler, _sorted_frames

    frames_dir, anns = frames_and_anns
    out_root = str(tmp_path / "out")
    ui = MaskLabeler(_sorted_frames(frames_dir), anns, out_root)
    for _ in range(2):  # save a label for each frame
        ui.on_click(_Ev(xdata=20, ydata=18))
        ui.on_key(_Ev(key="s"))
    labels_dir = os.path.join(out_root, "labels")
    images_dir = os.path.join(out_root, "images")
    assert len(os.listdir(labels_dir)) == 2

    chk = LabelChecker(sorted(
        os.path.join(images_dir, f) for f in os.listdir(images_dir)
    ), labels_dir)
    assert len(chk.pairs) == 2
    chk.on_key(_Ev(key="y"))          # keep the first
    chk.on_key(_Ev(key="n"))          # delete the second
    assert len(chk.kept) == 1 and len(chk.deleted) == 1
    assert len(os.listdir(labels_dir)) == 1


def test_two_point_measure(frames_and_anns):
    from tools.annotation_ui import TwoPointMeasure

    img = np.zeros((60, 80, 3), np.uint8)
    ui = TwoPointMeasure(img)
    ui.on_click(_Ev(xdata=10, ydata=10))
    ui.on_click(_Ev(xdata=13, ydata=14))
    assert ui.distances[-1] == pytest.approx(5.0)
    ui.on_key(_Ev(key="c"))
    assert ui.points == []
    # third/fourth click starts a fresh measurement
    ui.on_click(_Ev(xdata=0, ydata=0))
    ui.on_click(_Ev(xdata=30, ydata=40))
    assert ui.distances[-1] == pytest.approx(50.0)


def test_cli_measure_smoke(tmp_path, monkeypatch):
    import matplotlib.pyplot as plt

    from tools import annotation_ui

    img_path = str(tmp_path / "img.png")
    cv2.imwrite(img_path, np.zeros((20, 20, 3), np.uint8))
    monkeypatch.setattr(plt, "show", lambda: None)
    annotation_ui.main(["measure", "--image", img_path])
