"""Key-frame ground truth + annotation utilities (dev_tools/toolbox.py surface).

KEY_FRAME holds the hand-labelled [insert_start, insert_end] frames for the 19
evaluation videos (dev_tools/toolbox.py:8-29) — the ground truth behind the
per-video speed-error table (info.md:23-43) and compute_metrics.
"""

import re

from yolo_puncture_tpu.ops.geometry import polygon_encoding, rle_encoding  # noqa: F401

KEY_FRAME = {
    # video_num: [start_frame, end_frame]
    1: [122, 165],
    2: [44, 94],
    3: [0, 23],
    4: [73, 113],
    5: [27, 49],
    6: [25, 64],
    7: [14, 61],
    8: [141, 180],
    9: [12, 27],
    10: [7, 29],
    11: [3, 19],
    12: [9, 34],
    13: [9, 25],
    14: [29, 57],
    15: [30, 56],
    16: [62, 81],
    17: [151, 165],
    18: [111, 128],
    19: [60, 92],
}

FRAME_OFFSET = 20


def id_assign(video_num: int, frame_num: int) -> int:
    """Globally unique per-frame annotation id (toolbox.py:34-35)."""
    return int(video_num * 1e6 + frame_num)


def sort_by_filename(filename: str):
    """'1frame_1.jpg' → (1, 1) (toolbox.py:70-76)."""
    match = re.match(r"(\d+)\D+(\d+)\.(jpg|txt)", filename)
    if match:
        return int(match.group(1)), int(match.group(2))
    return 0, 0
