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
    args = parser.parse_args(argv)

    from apps.auto_speed_calc import build_pipeline
    from yolo_puncture_tpu.analytics.stats import compute_metrics
    from yolo_puncture_tpu.pipeline.video import iter_video_frames

    pipe = build_pipeline(args.yolo_model, args.classify_model, args.batch, args.imgsz)

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
        if not m or int(m.group(1)) not in KEY_FRAME:
            print(f"{name}: no ground truth, skipping")
            continue
        act = tuple(KEY_FRAME[int(m.group(1))])
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
