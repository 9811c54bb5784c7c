#!/usr/bin/env python
"""Headless batch needle-speed CLI — the reference's dev_tools/auto_speed_calc.py
surface (flags: -p/--path, -ym/--yolo_model, -cm/--classify_model,
-yct/--yolo_conf_threshold, -jw/--judge_wnd; auto_speed_calc.py:143-176) on the
TPU-native fused pipeline.

Output contract: per video, ``{video}:  {start}-{end}  {speed:.2f}mm/s``
(auto_speed_calc.py:167-168).  Multi-video: the reference iterates sequentially;
here each video still runs through one compiled device pipeline, and the frame
batches keep the chip busy (BASELINE config 5; multi-chip sharding via
--data-parallel when a mesh is available).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pipeline(yolo_model: str, classify_model: str, device_batch: int, imgsz: int):
    import jax.numpy as jnp

    from yolo_puncture_tpu.pipeline import VideoSpeedPipeline
    from yolo_puncture_tpu.predict import YOLO
    from yolo_puncture_tpu.tasks import ClassifierNet

    det = YOLO(yolo_model, nc=1, dtype=jnp.bfloat16)
    # calibration sidecar (yolo_cli calibrate): the batch CLI's conf=0.35
    # default (reference auto_speed_calc.py:152) reads calibrated when present
    det.load_calibration(os.path.dirname(yolo_model) or ".")
    cls = ClassifierNet(
        "efficientnet_b3",
        checkpoint=classify_model if os.path.exists(classify_model) else None,
        dtype=jnp.bfloat16,
    )
    return VideoSpeedPipeline(det, cls, device_batch=device_batch, imgsz=imgsz)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-p", "--path", type=str, required=True,
                        help="Path to video directory or file")
    parser.add_argument("-ym", "--yolo_model", type=str,
                        default="seg/yolo11n-seg-finetune.pt",
                        help="Path to YOLO model, e.g. seg/yolo11n-seg-finetune.pt")
    parser.add_argument("-cm", "--classify_model", type=str,
                        default="EfficientNet/efficientnet_b3.pth.tar",
                        help="Path to classification model")
    parser.add_argument("-yct", "--yolo_conf_threshold", type=float, default=0.35,
                        help="YOLO confidence threshold, default is 0.35")
    parser.add_argument("-jw", "--judge_wnd", type=int, default=20,
                        help="Window size for judging inserted needle, default is 20")
    parser.add_argument("--batch", type=int, default=16, help="device frame batch")
    parser.add_argument("--imgsz", type=int, default=640)
    args = parser.parse_args(argv)

    pipe = build_pipeline(args.yolo_model, args.classify_model, args.batch, args.imgsz)

    if os.path.isdir(args.path):
        videos = [
            os.path.join(args.path, v)
            for v in sorted(os.listdir(args.path))
            if v.endswith(".mp4")
        ]
    else:
        videos = [args.path]

    for video_path in videos:
        print(f"Processing video: {video_path}")
    # multi-video: frames interleave into shared device batches (BASELINE config 5)
    video_info = pipe.process_videos(
        videos, conf=args.yolo_conf_threshold, judge_wnd=args.judge_wnd
    )

    for video, info in video_info.items():
        speed = f"{info.speed_mm_s:.2f}mm/s" if info.speed_mm_s else "n/a"
        print(f"{video}:  {info.start_frame}-{info.end_frame}  {speed}")
    return video_info


if __name__ == "__main__":
    main()
