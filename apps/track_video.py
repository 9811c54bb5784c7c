#!/usr/bin/env python
"""YOLO-as-detector temporal mask propagation — the yolo_with_deva.py CLI surface.

Replicates the reference driver (yolo_seg/yolo_with_deva.py:211-262): video/dir →
frames (VideoReader contract), per-frame semionline/online scheduling
(process_frame, :103-208), ``pred.json`` dump (:260-262), Annotations/ PNG masks.
The YOLO detector + the propagation network run on TPU; the scheduler and id
bookkeeping stay on host.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from os import path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def auto_segment(config, image_np, yolo_model, min_side, suppress_small_mask):
    """YOLO instance seg → (id mask, segments_info) (yolo_with_deva.py:37-88)."""
    import cv2

    h, w = image_np.shape[:2]
    if min_side > 0:
        scale = min_side / min(h, w)
        image_np = cv2.resize(image_np, (int(w * scale), int(h * scale)))

    results = yolo_model.predict(
        image_np[..., ::-1], retina_masks=True, conf=0.9,
        imgsz=config.get("det_imgsz", 640),
    )
    det = results[0]
    output_mask = np.zeros((h, w), np.int64)
    segments_info = []
    curr_id = 1
    # mask-level duplicate suppression: detections arrive conf-sorted; a mask
    # whose containment (intersection / min area) vs an already-kept mask
    # exceeds ``dedup_overlap`` is a duplicate of the same object and is
    # dropped.  The reference has no such guard because it operates at
    # conf=0.9 with a COCO-pretrained checkpoint whose o2o head learned
    # duplicate suppression (yolo_with_deva.py:59); a from-scratch v10 head
    # emits low-conf duplicates that would otherwise repaint the object under
    # a second id (VERDICT r4 item 1).  Set dedup_overlap >= 1 to disable.
    dedup = float(config.get("dedup_overlap", 0.6))
    kept_masks = []
    if det.masks is not None:
        from yolo_puncture_tpu.track import ObjectInfo

        for i in range(len(det.masks)):
            mask = det.masks.data[i]
            if mask.shape != (h, w):
                mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_LINEAR)
            if suppress_small_mask and mask.sum() < config.get("MIN_AREA_THRESHOLD", 100):
                continue
            mb = mask > 0.5
            area = mb.sum()
            if any(
                (mb & k).sum() / max(min(area, k.sum()), 1) > dedup
                for k in kept_masks
            ):
                continue
            kept_masks.append(mb)
            output_mask[mb] = curr_id
            segments_info.append(
                ObjectInfo(
                    id=curr_id,
                    score=float(det.boxes.conf[i]),
                    category_id=int(det.boxes.cls[i]),
                )
            )
            curr_id += 1
    return output_mask, segments_info


def process_frame(tracker, yolo_model, frame_path, result_saver, ti, image_np=None):
    """Semionline/online per-frame scheduler (yolo_with_deva.py:103-208)."""
    import cv2

    from yolo_puncture_tpu.track import FrameInfo
    from yolo_puncture_tpu.track.saver import get_input_frame_for_deva

    if image_np is None:
        image_np = cv2.imread(frame_path)[..., ::-1]
    cfg = tracker.config
    h, w = image_np.shape[:2]
    new_min_side = cfg.get("size", 480)
    suppress_small_mask = cfg.get("suppress_small_objects", True)
    need_resize = new_min_side > 0
    image = get_input_frame_for_deva(image_np, new_min_side)
    frame_name = path.basename(frame_path)
    frame_info = FrameInfo(image, None, None, ti, {"frame": [frame_name], "shape": [h, w]})

    if cfg.get("temporal_setting", "semionline") == "semionline":
        if ti + cfg.get("num_voting_frames", 3) > tracker.next_voting_frame:
            mask, segments_info = auto_segment(
                cfg, image_np, yolo_model, new_min_side, suppress_small_mask
            )
            frame_info.mask = mask
            frame_info.segments_info = segments_info
            frame_info.image_np = image_np
            tracker.add_to_temporary_buffer(frame_info)

            if ti == tracker.next_voting_frame:
                keyframe = tracker.frame_buffer[0]
                _, mask, new_segments_info = tracker.vote_in_temporary_buffer(
                    keyframe_selection="first"
                )
                prob = tracker.incorporate_detection(
                    keyframe.image, mask, new_segments_info, incremental=True
                )
                tracker.next_voting_frame += cfg.get("detection_every", 5)
                result_saver.save_mask(
                    prob, keyframe.name, need_resize=need_resize, shape=(h, w),
                    image_np=keyframe.image_np,
                )
                for fi in tracker.frame_buffer[1:]:
                    prob = tracker.step(fi.image, None, None)
                    result_saver.save_mask(
                        prob, fi.name, need_resize, shape=(h, w), image_np=fi.image_np
                    )
                tracker.clear_buffer()
        else:
            prob = tracker.step(image, None, None)
            result_saver.save_mask(
                prob, frame_name, need_resize=need_resize, shape=(h, w), image_np=image_np
            )
    else:  # online
        if ti % cfg.get("detection_every", 5) == 0:
            mask, segments_info = auto_segment(
                cfg, image_np, yolo_model, new_min_side, suppress_small_mask
            )
            prob = tracker.incorporate_detection(image, mask, segments_info, incremental=True)
        else:
            prob = tracker.step(image, None, None)
        result_saver.save_mask(
            prob, frame_name, need_resize=need_resize, shape=(h, w), image_np=image_np
        )


def process_video_batched(tracker, yolo_model, video_reader, result_saver):
    """process_frame semantics with propagation-only frames batched.

    Runs of consecutive ``tracker.step`` frames (between detections / voting
    windows) go through ``TrackerCore.step_batch`` — the windowed fast path
    (batched readout/decode per memory-write window) — instead of one device
    round-trip per frame.  Detection, voting, and incorporate scheduling are
    identical to process_frame; memory-op order is preserved by flushing the
    pending run before any incorporate.
    """
    from yolo_puncture_tpu.track import FrameInfo
    from yolo_puncture_tpu.track.saver import get_input_frame_for_deva

    cfg = tracker.config
    semionline = cfg.get("temporal_setting", "semionline") == "semionline"
    min_side = cfg.get("size", 480)
    suppress_small_mask = cfg.get("suppress_small_objects", True)
    need_resize = min_side > 0
    pending = []  # (image, frame_name, (h, w), image_np)

    def flush_pending():
        if not pending:
            return
        probs = tracker.step_batch([p[0] for p in pending])
        for prob, (_, name, shape, image_np) in zip(probs, pending):
            result_saver.save_mask(
                prob, name, need_resize=need_resize, shape=shape, image_np=image_np
            )
        pending.clear()

    for ti, (frame, im_path) in enumerate(video_reader):
        image_np = frame
        h, w = image_np.shape[:2]
        image = get_input_frame_for_deva(image_np, min_side)
        frame_name = path.basename(im_path)

        if semionline:
            if ti + cfg.get("num_voting_frames", 3) > tracker.next_voting_frame:
                flush_pending()
                mask, segments_info = auto_segment(
                    cfg, image_np, yolo_model, min_side, suppress_small_mask
                )
                fi = FrameInfo(
                    image, mask, segments_info, ti,
                    {"frame": [frame_name], "shape": [h, w]}, image_np=image_np,
                )
                tracker.add_to_temporary_buffer(fi)
                if ti == tracker.next_voting_frame:
                    keyframe = tracker.frame_buffer[0]
                    _, vmask, new_infos = tracker.vote_in_temporary_buffer(
                        keyframe_selection="first"
                    )
                    prob = tracker.incorporate_detection(
                        keyframe.image, vmask, new_infos, incremental=True
                    )
                    tracker.next_voting_frame += cfg.get("detection_every", 5)
                    result_saver.save_mask(
                        prob, keyframe.name, need_resize=need_resize, shape=(h, w),
                        image_np=keyframe.image_np,
                    )
                    rest = tracker.frame_buffer[1:]
                    if rest:
                        probs = tracker.step_batch([f.image for f in rest])
                        for prob, f in zip(probs, rest):
                            result_saver.save_mask(
                                prob, f.name, need_resize, shape=(h, w),
                                image_np=f.image_np,
                            )
                    tracker.clear_buffer()
            else:
                pending.append((image, frame_name, (h, w), image_np))
        else:  # online
            if ti % cfg.get("detection_every", 5) == 0:
                flush_pending()
                mask, segments_info = auto_segment(
                    cfg, image_np, yolo_model, min_side, suppress_small_mask
                )
                prob = tracker.incorporate_detection(
                    image, mask, segments_info, incremental=True
                )
                result_saver.save_mask(
                    prob, frame_name, need_resize=need_resize, shape=(h, w),
                    image_np=image_np,
                )
            else:
                pending.append((image, frame_name, (h, w), image_np))
    flush_pending()


def main(argv=None):
    import jax.numpy as jnp

    from yolo_puncture_tpu.pipeline import VideoReader
    from yolo_puncture_tpu.predict import YOLO
    from yolo_puncture_tpu.track import ResultSaver, TrackerCore, flush_buffer

    parser = argparse.ArgumentParser()
    parser.add_argument("--video_name", type=str, required=True)
    parser.add_argument("--img_path", type=str, required=True,
                        help="video file or frame directory")
    parser.add_argument("--output", type=str, default="./track_out")
    parser.add_argument("--model", type=str, default="seg/yolo11n-seg-finetune.pt")
    parser.add_argument("--temporal_setting", type=str, default="semionline",
                        choices=["semionline", "online"])
    parser.add_argument("--num_voting_frames", type=int, default=3)
    parser.add_argument("--detection_every", type=int, default=5)
    parser.add_argument("--size", type=int, default=480)
    parser.add_argument("--max_missed_detection_count", type=int, default=10)
    parser.add_argument("--max_mid_term_frames", type=int, default=10)
    parser.add_argument("--min_mid_term_frames", type=int, default=5)
    parser.add_argument("--num_prototypes", type=int, default=128)
    parser.add_argument("--max_long_term_elements", type=int, default=10000)
    parser.add_argument("--disable_long_term", action="store_true")
    parser.add_argument("--mem_every", type=int, default=5)
    parser.add_argument("--amp", action="store_true", help="bf16 compute")
    parser.add_argument("--imgsz", type=int, default=640, help="detector letterbox size")
    parser.add_argument("--tracker_weights", type=str, default=None,
                        help="msgpack propagation weights (apps/train_tracker.py)")
    parser.add_argument("--batch_propagation", action="store_true",
                        help="batch propagation-only frames through the windowed "
                        "fast path (TrackerCore.step_batch)")
    parser.add_argument("--align_voting", nargs="?", const="affinity",
                        default="off", choices=["off", "affinity", "propagate"],
                        help="project buffered detections into keyframe coords "
                        "before semionline voting: bare flag/'affinity' = "
                        "single-hop key-affinity correspondence; 'propagate' = "
                        "true backward propagation through the buffer (DEVA's "
                        "mechanism)")
    args = parser.parse_args(argv)

    cfg = {
        "temporal_setting": args.temporal_setting,
        "num_voting_frames": args.num_voting_frames,
        "detection_every": args.detection_every,
        "size": args.size,
        "suppress_small_objects": True,
        "mem_every": args.mem_every,
        "enable_long_term": not args.disable_long_term,
        "max_mid_term_frames": args.max_mid_term_frames,
        "min_mid_term_frames": args.min_mid_term_frames,
        "num_prototypes": args.num_prototypes,
        "max_long_term_elements": args.max_long_term_elements,
        "max_missed_detection_count": args.max_missed_detection_count,
        "align_voting": False if args.align_voting == "off" else args.align_voting,
        "video_name": args.video_name,
        "det_imgsz": args.imgsz,
    }

    video_reader = VideoReader(args.img_path)
    vid_length = len(video_reader)
    # long-term enablement formula (yolo_with_deva.py:242-245)
    cfg["enable_long_term_count_usage"] = (
        cfg["enable_long_term"]
        and (
            vid_length
            / (cfg["max_mid_term_frames"] - cfg["min_mid_term_frames"])
            * cfg["num_prototypes"]
        )
        >= cfg["max_long_term_elements"]
    )
    print("Configuration:", cfg)

    dtype = jnp.bfloat16 if args.amp else jnp.float32
    yolo_model = YOLO(args.model, nc=1, dtype=dtype)
    # Platt calibration sidecar (yolo_cli calibrate) next to the weights: when
    # present, auto_segment's hardcoded conf=0.9 (the reference operating
    # point, yolo_with_deva.py:59) sits on the calibrated scale
    yolo_model.load_calibration(os.path.dirname(args.model) or ".")
    # tracker input geometry: min side = size at source aspect, /16-padded —
    # same helper the bench uses (round-to-16 here once disagreed with it:
    # 480x848 vs the reference 480x864)
    from yolo_puncture_tpu.track import reference_tracker_geometry

    h0, w0 = video_reader[0][0].shape[:2]
    th, tw = reference_tracker_geometry((h0, w0), args.size)
    tracker = TrackerCore(
        config=cfg,
        variables=args.tracker_weights if args.tracker_weights
        and os.path.exists(args.tracker_weights) else None,
        image_size=(max(th, 16), max(tw, 16)),
        dtype=dtype,
    )
    tracker.next_voting_frame = args.num_voting_frames - 1
    tracker.enabled_long_id()
    result_saver = ResultSaver(
        args.output, cfg["video_name"], dataset="demo",
        object_manager=tracker.object_manager,
    )

    if args.batch_propagation:
        process_video_batched(tracker, yolo_model, video_reader, result_saver)
    else:
        for ti, (frame, im_path) in enumerate(video_reader):
            process_frame(tracker, yolo_model, im_path, result_saver, ti, image_np=frame)
    flush_buffer(tracker, result_saver)
    result_saver.end()

    os.makedirs(args.output, exist_ok=True)
    with open(path.join(args.output, "pred.json"), "w") as f:
        json.dump(result_saver.video_json, f, indent=4)


if __name__ == "__main__":
    main()
