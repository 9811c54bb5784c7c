"""Dataset generation: YOLO-pseudo-label cls+bbox dataset from videos.

Port of dev_tools/classify/cls_bbox_dataset_generate.py: extract frames as
'{video_no}frame_{i}.jpg', run the seg model, write one 'cls x y w h' line per
frame where cls = int(frame_index >= key_index) (the insertion-state flip at the
hand-labelled key frame, cls_bbox_dataset_generate.py:56) using normalized xywh
of the top detection.
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np


def gen(model, video_path: str, output_directory: str, mode: str = "train",
        key_index: int = 0) -> int:
    import cv2

    file_name = os.path.basename(video_path)
    match = re.search(r"video(\d+)\.mp4", file_name, re.IGNORECASE)
    # non-matching names fall back to the unique stem — a constant '0' would
    # collide frame/label filenames across videos and silently overwrite
    video_no = match.group(1) if match else os.path.splitext(file_name)[0]

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        print(f"cannot open video {video_path}")
        return 0
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()

    path1 = os.path.join(output_directory, "images", mode)
    path2 = os.path.join(output_directory, "labels", mode)
    os.makedirs(path1, exist_ok=True)
    os.makedirs(path2, exist_ok=True)

    for i, frame in enumerate(frames):
        image_name = f"{video_no}frame_{i}"
        cv2.imwrite(os.path.join(path1, f"{image_name}.jpg"), frame)
        result = model.predict(frame, retina_masks=True)[0]
        boxes = result.boxes
        if len(boxes.cls) == 0:
            continue
        x, y, w, h = [float(v) for v in boxes.xywhn[0]]
        with open(os.path.join(path2, f"{image_name}.txt"), "w") as f:
            f.writelines(f"{int(i >= key_index)} {x} {y} {w} {h}")
    print(f"video {video_path}: extracted {len(frames)} frames")
    return len(frames)


def main(argv=None):
    from yolo_puncture_tpu.predict import YOLO

    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="seg/yolo11n-seg-finetune.pt")
    parser.add_argument("--videos", nargs="+", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--mode", default="train", choices=["train", "val"])
    parser.add_argument("--key_indices", nargs="+", type=int, required=True,
                        help="insertion key frame per video (same order)")
    args = parser.parse_args(argv)
    model = YOLO(args.model, nc=1)
    for vpath, key in zip(args.videos, args.key_indices):
        gen(model, vpath, args.out, mode=args.mode, key_index=key)


if __name__ == "__main__":
    main()
