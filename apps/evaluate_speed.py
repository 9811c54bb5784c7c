#!/usr/bin/env python
"""Speed-accuracy evaluation against the hand-labelled key frames.

Reproduces the reference's evaluation protocol (info.md:23-43 per-video table;
compute_metrics at yolo_seg/utils/speed_tools.py:76-97; ground truth in
dev_tools/toolbox.py KEY_FRAME): run the pipeline over ``video{N}.mp4`` files,
compare predicted (start, end) and speed against KEY_FRAME[N], print per-video
relative deviations for raw / Gaussian / Savitzky-Golay smoothing and their means
(the info.md:76-89 ablation row).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.toolbox import KEY_FRAME


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-p", "--path", required=True, help="video dir or file")
    parser.add_argument("-ym", "--yolo_model", default="seg/yolo11n-seg-finetune.pt")
    parser.add_argument("-cm", "--classify_model", default="EfficientNet/efficientnet_b3.pth.tar")
    parser.add_argument("-yct", "--yolo_conf_threshold", type=float, default=0.35)
    parser.add_argument("-jw", "--judge_wnd", type=int, default=20)
    parser.add_argument("--imgsz", type=int, default=640)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--key_frames", default=None,
                        help="JSON file {video_no: [start, end]} overriding the "
                        "built-in KEY_FRAME ground truth (drive the reference "
                        "harness on synthetic-protocol videos)")
    parser.add_argument("--det_init", default=None,
                        help="flax msgpack detector variables (e.g. from "
                        "tools/e2e_accuracy_eval.py --save_det) loaded over "
                        "the built model")
    parser.add_argument("--cls_init", default=None,
                        help="flax msgpack classifier variables")
    parser.add_argument("--cls_model", default=None,
                        help="classifier registry name override (e.g. "
                        "efficientnet_b0 to match a --cls_init checkpoint)")
    parser.add_argument("--crop_size", type=int, default=None,
                        help="classifier crop size override (e2e protocol: 96)")
    args = parser.parse_args(argv)

    from apps.auto_speed_calc import build_pipeline
    from yolo_puncture_tpu.analytics.stats import compute_metrics
    from yolo_puncture_tpu.pipeline.video import iter_video_frames

    key_frame = KEY_FRAME
    if args.key_frames:
        import json

        with open(args.key_frames) as f:
            key_frame = {int(k): tuple(v) for k, v in json.load(f).items()}

    if args.cls_model or args.crop_size:
        # custom classifier/crop geometry (synthetic-protocol drive): fp32 so
        # the harness also runs on the CPU backend (no bf16 dot support there)
        from yolo_puncture_tpu.pipeline import VideoSpeedPipeline
        from yolo_puncture_tpu.predict import YOLO
        from yolo_puncture_tpu.tasks import ClassifierNet

        det = YOLO(args.yolo_model, nc=1)
        cls = ClassifierNet(
            args.cls_model or "efficientnet_b3",
            **({"input_size": args.crop_size} if args.crop_size else {}),
        )
        pipe = VideoSpeedPipeline(
            det, cls, device_batch=args.batch, imgsz=args.imgsz,
            **({"crop_size": args.crop_size} if args.crop_size else {}),
        )
    else:
        pipe = build_pipeline(args.yolo_model, args.classify_model, args.batch,
                              args.imgsz)
    if args.det_init:
        from flax import serialization

        with open(args.det_init, "rb") as f:
            pipe.detector.variables = serialization.from_bytes(
                pipe.detector.variables, f.read())
    if args.cls_init:
        from flax import serialization

        with open(args.cls_init, "rb") as f:
            pipe.classifier.variables = serialization.from_bytes(
                pipe.classifier.variables, f.read())

    if os.path.isdir(args.path):
        videos = sorted(
            os.path.join(args.path, v) for v in os.listdir(args.path) if v.endswith(".mp4")
        )
    else:
        videos = [args.path]

    deviations = {}
    for vp in videos:
        name = os.path.splitext(os.path.basename(vp))[0]
        m = re.search(r"video(\d+)", name)
        if not m or int(m.group(1)) not in key_frame:
            print(f"{name}: no ground truth, skipping")
            continue
        act = tuple(key_frame[int(m.group(1))])
        fps, _, _, frames = iter_video_frames(vp)
        out = pipe.process_frames(frames, fps, conf=args.yolo_conf_threshold,
                                  judge_wnd=args.judge_wnd)
        if out.start_frame is None:
            print(f"{name}: pipeline produced no key frame")
            continue
        try:
            devs = compute_metrics(
                out.lens, (out.start_frame, out.end_frame or out.start_frame + 1),
                act, fps,
            )
        except ZeroDivisionError:
            print(f"{name}: degenerate lens; skipping")
            continue
        deviations[name] = devs
        print(
            f"{name}: pred {out.start_frame}-{out.end_frame} vs actual {act} "
            f"| dev raw={devs[0]:.2f} gauss={devs[1]:.2f} savgol={devs[2]:.2f}"
        )

    if deviations:
        avgs = [sum(v) / len(deviations) for v in zip(*deviations.values())]
        print(
            f"Avg - Normal: {avgs[0]:.2f}, Gaussian: {avgs[1]:.2f}, "
            f"Savitzky Golay: {avgs[2]:.2f}"
        )
    return deviations


if __name__ == "__main__":
    main()
