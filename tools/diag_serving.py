#!/usr/bin/env python
"""Separating diagnostic for the serving-tracker collapse (VERDICT r4 item 1).

Decomposes the serving-eval IoU into its two independent factors on the
protocol's own first clip (seed path identical to serving_eval_real):

  det     per-frame DETECTOR mask IoU vs GT (upper-bounds what
          incorporate_detection can inject)
  prop    pure PROPAGATION from the GT frame-0 mask, no detector at all
          (upper-bounds what step() can carry between detections)

    python tools/diag_serving.py --detector runs/... [--det_conf 0.9]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detector", required=True)
    ap.add_argument("--det_arch", default="yolo10s-seg")
    ap.add_argument("--det_ema", action="store_true", default=True)
    ap.add_argument("--det_conf", type=float, default=0.9)
    ap.add_argument("--det_imgsz", type=int, default=640)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--tracker_size", type=int, default=480)
    ap.add_argument("--weights", default=None,
                    help="tracker msgpack override (default: shipped ckpt)")
    args = ap.parse_args()

    from tools.eval_tracker_quality import (_iou, _load_detector,
                                            make_serving_video)

    rng = np.random.default_rng(args.seed + 3)  # same stream as serving eval
    frames, masks = make_serving_video(rng, args.frames, size=args.size,
                                       n_needles=1)
    det = _load_detector(args.detector, args.det_arch, use_ema=args.det_ema)

    # --- factor 1: detector mask quality, per frame -----------------------
    det_ious, det_miss = [], 0
    for t in range(args.frames):
        r = det.predict(frames[t], conf=args.det_conf, imgsz=args.det_imgsz,
                        retina_masks=True)[0]
        gt = masks[t, 0] > 0.5
        if r.masks is None or len(r.masks) == 0:
            det_miss += 1
            det_ious.append(0.0)
            continue
        md = np.asarray(r.masks.data)
        best = max(_iou(md[i] > 0.5, gt) for i in range(md.shape[0]))
        det_ious.append(float(best))
    print(json.dumps({
        "factor": "detector-mask-vs-gt", "mean_iou": float(np.mean(det_ious)),
        "p10": float(np.percentile(det_ious, 10)),
        "p50": float(np.percentile(det_ious, 50)),
        "miss": det_miss, "frames": args.frames,
        "conf": args.det_conf,
    }), flush=True)

    # --- factor 2: pure propagation from the GT frame-0 mask --------------
    import jax.numpy as jnp

    from yolo_puncture_tpu.track import TrackerCore, reference_tracker_geometry

    th, tw = reference_tracker_geometry((args.size, args.size),
                                        args.tracker_size)
    w = args.weights or os.path.join(REPO, "resources", "weights",
                                     "tracker_propagation.msgpack")
    core = TrackerCore(image_size=(th, tw), max_objects=4, mem_frames=8,
                       variables=w, dtype=jnp.float32)
    import cv2

    m0 = (cv2.resize(masks[0, 0], (tw, th),
                     interpolation=cv2.INTER_NEAREST) > 0.5)
    seg0 = np.zeros((th, tw), np.int64)
    seg0[m0] = 1
    from yolo_puncture_tpu.track.core import ObjectInfo
    core.incorporate_detection(frames[0], seg0,
                               [ObjectInfo(id=1, score=1.0, category_id=1)])
    prop_ious = []
    for t in range(1, args.frames):
        prob = core.step(frames[t])  # (No+1, th, tw); channel 1 = slot of id 1
        ids = np.asarray(prob).argmax(0).astype(np.int32)
        ids_full = cv2.resize(ids, (args.size, args.size),
                              interpolation=cv2.INTER_NEAREST)
        gt = masks[t, 0] > 0.5
        v = _iou(ids_full == 1, gt)
        prop_ious.append(0.0 if np.isnan(v) else float(v))
    print(json.dumps({
        "factor": "pure-propagation-from-gt", "mean_iou": float(np.mean(prop_ious)),
        "first8": [round(v, 3) for v in prop_ious[:8]],
        "last8": [round(v, 3) for v in prop_ious[-8:]],
    }), flush=True)


if __name__ == "__main__":
    main()
