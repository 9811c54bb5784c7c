"""Video utilities (dev_tools/video_tools/* surfaces): frame extraction,
frame-sequence→video assembly, interval speed calculation, manual two-point
distance measurement."""

from __future__ import annotations

import argparse
import os
import re
from typing import Optional

import numpy as np


def video2frames(video_path: str, output_dir: str, prefix: Optional[str] = None) -> int:
    """Split a video into '{video_no}frame_{i}.jpg' files
    (dev_tools/video_tools/video2frames.py:29-52 naming contract)."""
    import cv2

    os.makedirs(output_dir, exist_ok=True)
    name = os.path.basename(video_path)
    match = re.search(r"video(\d+)", name, re.IGNORECASE)
    video_no = prefix if prefix is not None else (match.group(1) if match else "")
    cap = cv2.VideoCapture(video_path)
    count = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        cv2.imwrite(os.path.join(output_dir, f"{video_no}frame_{count}.jpg"), frame)
        count += 1
    cap.release()
    return count


def extract_frames(video_path: str, output_directory: str) -> int:
    """Per-video classifier-dataset extraction: frames land in a
    ``{output_directory}/{video_no}/`` subdir with the same
    '{video_no}frame_{i}.jpg' names (dev_tools/classify/
    extract_frames_from_video.py:8-40 contract — requires a 'video<N>'
    filename)."""
    name = os.path.basename(video_path)
    match = re.search(r"video(\d+)", name, re.IGNORECASE)
    if match is None:
        raise ValueError(f"cannot parse video number from {name!r}")
    video_no = match.group(1)
    return video2frames(
        video_path, os.path.join(output_directory, video_no), prefix=video_no
    )


def frames2video(frames_dir: str, output_path: str, fps: float = 30.0) -> int:
    """Assemble numerically-sorted frames back into a video
    (dev_tools/video_tools/frames2video.py:8-26)."""
    import cv2

    from yolo_puncture_tpu.pipeline.video import sort_key

    frames = sorted(
        (f for f in os.listdir(frames_dir) if f.lower().endswith((".jpg", ".png"))),
        key=sort_key,
    )
    if not frames:
        raise ValueError(f"no frames in {frames_dir}")
    first = cv2.imread(os.path.join(frames_dir, frames[0]))
    h, w = first.shape[:2]
    out = cv2.VideoWriter(output_path, cv2.VideoWriter.fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        out.write(cv2.imread(os.path.join(frames_dir, f)))
    out.release()
    return len(frames)


def calculate_speed(
    start_frame: int,
    end_frame_min: int,
    end_frame_max: int,
    frame_rate: float = 30,
    distance_mm: float = 2,
):
    """Min/max interval speed (dev_tools/video_tools/compute_speed.py:7-22)."""
    frame_count_max = end_frame_min - start_frame
    frame_count_min = end_frame_max - start_frame
    time_min = frame_count_min / frame_rate
    time_max = frame_count_max / frame_rate
    speed_min = distance_mm / time_min
    speed_max = distance_mm / time_max
    print(f"min: {speed_min:.2f} mm/s")
    print(f"max: {speed_max:.2f} mm/s")
    return speed_min, speed_max


def two_point_distance(p1, p2) -> float:
    """Euclidean pixel distance (dev_tools/video_tools/two_point_dis.py manual-
    measurement core; the interactive click UI needs a display)."""
    return float(np.hypot(p2[0] - p1[0], p2[1] - p1[1]))


def main(argv=None):
    parser = argparse.ArgumentParser(description="video tools")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("video2frames")
    p1.add_argument("video")
    p1.add_argument("outdir")
    p1e = sub.add_parser("extract_frames")
    p1e.add_argument("video")
    p1e.add_argument("outdir")
    p2 = sub.add_parser("frames2video")
    p2.add_argument("framesdir")
    p2.add_argument("output")
    p2.add_argument("--fps", type=float, default=30.0)
    p3 = sub.add_parser("speed")
    p3.add_argument("--start_frame", type=int, required=True)
    p3.add_argument("--end_frame_min", type=int, required=True)
    p3.add_argument("--end_frame_max", type=int, required=True)
    p3.add_argument("--frame_rate", type=int, default=30)
    p3.add_argument("--distance_mm", type=int, default=2)
    args = parser.parse_args(argv)
    if args.cmd == "video2frames":
        print(video2frames(args.video, args.outdir))
    elif args.cmd == "extract_frames":
        print(extract_frames(args.video, args.outdir))
    elif args.cmd == "frames2video":
        print(frames2video(args.framesdir, args.output, args.fps))
    else:
        calculate_speed(
            args.start_frame, args.end_frame_min, args.end_frame_max,
            args.frame_rate, args.distance_mm,
        )


if __name__ == "__main__":
    main()
