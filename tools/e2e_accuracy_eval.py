#!/usr/bin/env python
"""End-to-end accuracy reproduction protocol on synthetic ground truth
(VERDICT.md round-1 item "reference-accuracy reproduction protocol").

The reference's quality bar is the per-video speed-error table over 19 real
videos (/root/reference/info.md:23-43, ground truth in dev_tools/toolbox.py:8-29).
No patient videos or fine-tuned weights exist in this environment, so this tool
reproduces the protocol end to end on synthetic puncture videos with KNOWN
ground truth:

  1. generate puncture videos: textured background, a bright needle shaft of
     nominal length 20 mm above a skin band; at the key frame it starts
     entering the skin at a known speed (visible length shrinks), with a
     visual insertion cue at the entry point;
  2. train the detector (yolo10n-seg) on annotated frames from training
     videos, and the insert classifier (efficientnet_b0) on crops;
  3. run the SAME fused VideoSpeedPipeline a user runs
     (apps/auto_speed_calc.py path) over held-out videos;
  4. report per-video actual vs predicted key frame and speed with relative
     error — the info.md:23-43 table shape.

    python tools/e2e_accuracy_eval.py            # full protocol (~20-40 min CPU)
    python tools/e2e_accuracy_eval.py --quick    # smoke (fewer steps/videos)
Writes docs/e2e_accuracy.md and prints one JSON line.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

SIZE = 128          # square video frames == detector imgsz (letterbox identity)
PX_PER_MM = 3.0     # 20 mm shaft = 60 px
INIT_LEN_MM = 20.0
SKIN_Y = 100


def make_puncture_video(rng, n_frames=64, fps=30.0, key_frame=None, speed_mm_s=None,
                        tip_noise_px=0.0):
    """Returns (frames list of BGR uint8 (SIZE, SIZE, 3), gt dict).

    ``tip_noise_px``: per-frame Gaussian jitter (σ, pixels) of the RENDERED
    needle tip — mask-extraction noise as real footage has (ragged mask
    boundaries, specular tip flicker).  Ground-truth key_frame/speed stay
    exact; only the observable length series gets noisy.  The default 0 keeps
    the r2/r3 protocol's noiseless series (the regime where smoothing the
    length series can only add bias — see docs/e2e_accuracy.md ablation)."""
    key_frame = key_frame if key_frame is not None else int(rng.integers(12, 28))
    speed_mm_s = speed_mm_s if speed_mm_s is not None else float(rng.uniform(1.5, 4.5))
    # the 2 mm-drop end frame must exist inside the clip (slow insertions need
    # enough post-key frames, plus smoothing margin) or the ground truth itself
    # admits no speed estimate
    key_frame = min(key_frame, n_frames - int(2.8 / speed_mm_s * fps) - 3)
    key_frame = max(key_frame, 8)
    L0 = INIT_LEN_MM * PX_PER_MM
    cx = int(rng.integers(40, SIZE - 40))
    # width ≥10 px: a thinner shaft leaves the stride-8 anchor grid without a
    # center column inside the box, the task-aligned assigner finds no positive
    # candidates, and training silently converges to "predict nothing"
    wpx = int(rng.integers(10, 15))
    base = rng.uniform(0.25, 0.45, size=(SIZE, SIZE, 3)).astype(np.float32)
    base += rng.uniform(0, 0.08, size=(SIZE, SIZE, 3))
    skin_color = np.array([0.45, 0.5, 0.65], np.float32)  # BGR skin-ish
    needle_color = np.array([0.92, 0.92, 0.9], np.float32)

    frames, gt_boxes, gt_lens = [], [], []
    for t in range(n_frames):
        img = base.copy() * rng.uniform(0.95, 1.05)
        img[SKIN_Y:] = skin_color * rng.uniform(0.95, 1.05)
        if t < key_frame:
            vis = L0
        else:
            vis = max(L0 - speed_mm_s * PX_PER_MM * (t - key_frame) / fps, 8.0)
        if tip_noise_px:
            vis = float(np.clip(vis + rng.normal(0, tip_noise_px), 6.0, L0 + 4.0))
        jx = int(rng.integers(-1, 2))
        x1, x2 = cx - wpx // 2 + jx, cx + wpx // 2 + jx
        y_top = int(round(SKIN_Y - vis))
        img[y_top:SKIN_Y, x1:x2] = needle_color * rng.uniform(0.97, 1.03)
        if t >= key_frame:
            # insertion cue at the entry point (skin deformation analog)
            img[SKIN_Y - 3 : SKIN_Y + 4, x1 - 4 : x2 + 4, 2] = 0.95
            img[SKIN_Y - 3 : SKIN_Y + 4, x1 - 4 : x2 + 4, :2] *= 0.4
        frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
        gt_boxes.append((x1, y_top, x2, SKIN_Y))
        gt_lens.append(vis)
    return frames, {
        "key_frame": key_frame,
        "speed_mm_s": speed_mm_s,
        "boxes": gt_boxes,
        "lens": gt_lens,
        "fps": fps,
    }


def train_detector(train_videos, steps, seed=0, model_name="yolo10n-seg"):
    from yolo_puncture_tpu import create_model
    from yolo_puncture_tpu.train.trainer import Trainer

    rng = np.random.default_rng(seed)
    all_frames, all_boxes = [], []
    for frames, gt in train_videos:
        for f, b in zip(frames, gt["boxes"]):
            all_frames.append(f)
            all_boxes.append(b)
    n, M, B = len(all_frames), 4, 4

    def make_batch():
        idx = rng.integers(0, n, size=B)
        imgs = np.stack([all_frames[i][..., ::-1] for i in idx]).astype(np.float32) / 255.0
        boxes = np.zeros((B, M, 4), np.float32)
        masks = np.zeros((B, M, SIZE // 4, SIZE // 4), np.float32)
        mask_gt = np.zeros((B, M), bool)
        for j, i in enumerate(idx):
            x1, y1, x2, y2 = all_boxes[i]
            boxes[j, 0] = (x1, y1, x2, y2)
            # sub-cell polygon rasterization at /4: cv2.fillPoly's fixed-point
            # `shift` keeps 1/16-cell corner precision (the r3 integer `y//4`
            # slicing floored the supervised top edge to whole 4-px cells, a
            # floor on the length-series fidelity the speed estimate rests on;
            # plain np.round kept a residual whole-cell quantization — ADVICE r4)
            import cv2

            SHIFT = 4
            poly4 = (np.array(
                [[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32) / 4.0)
            cell = np.zeros((SIZE // 4, SIZE // 4), np.uint8)
            cv2.fillPoly(
                cell, [np.round(poly4 * (1 << SHIFT)).astype(np.int32)], 1,
                shift=SHIFT,
            )
            masks[j, 0] = cell
            mask_gt[j, 0] = True
        return {
            "images": imgs,
            "gt_labels": np.zeros((B, M), np.int32),
            "gt_bboxes": boxes,
            "mask_gt": mask_gt,
            "gt_masks": masks,
        }

    model = create_model(model_name, nc=1)
    tr = Trainer(model, nc=1, imgsz=SIZE, lr0=0.01, total_steps=steps,
                 warmup_steps=max(steps // 20, 5), use_ema=False)
    state = tr.init_state(make_batch())
    for i in range(steps):
        state, metrics = tr.train_step(state, make_batch())
        if i % max(steps // 10, 1) == 0:
            print(f"det step {i}: loss {float(metrics['total']):.3f}", flush=True)
    from yolo_puncture_tpu.predict import YOLO

    det = YOLO(model_name, nc=1)
    det.variables = {"params": state.params, "batch_stats": state.batch_stats}
    return det


def train_classifier(train_videos, crop_size, epochs=3, seed=0, det=None):
    """Insert classifier on crops around the box.

    ``det`` (r4): crop around the DETECTOR's predicted box instead of the GT
    box — the reference generates its classifier dataset from YOLO
    predictions (dev_tools/classify/cls_bbox_dataset_generate.py:48-52), and
    training on GT boxes leaves the classifier keying on needle-in-crop
    geometry the detector's noisier boxes at eval time don't reproduce
    (measured r4: perfect class sequences on GT-box crops, near-random on
    detected-box crops from the same video).  A ±4 px jittered copy per frame
    adds box-noise robustness either way; GT box is the dropout fallback."""
    from yolo_puncture_tpu.tasks.classify import ClassifierNet
    from yolo_puncture_tpu.train.finetune import ClassifierFinetuner
    from yolo_puncture_tpu.utils.transform import crop_frame

    jrng = np.random.default_rng(seed + 17)
    crops, labels = [], []
    for frames, gt in train_videos:
        boxes = list(gt["boxes"])
        if det is not None:
            for t, f in enumerate(frames):
                r = det.predict(f, conf=0.35, imgsz=SIZE, retina_masks=False)[0]
                if len(r.boxes):
                    i = int(np.argmax(r.boxes.conf))
                    boxes[t] = tuple(float(v) for v in r.boxes.xyxy[i])
        for t, (f, b) in enumerate(zip(frames, boxes)):
            lab = int(t >= gt["key_frame"])
            for jit in (False, True):
                bb = b
                if jit:
                    dx, dy = jrng.integers(-4, 5, size=2)
                    bb = (b[0] + dx, b[1] + dy, b[2] + dx, b[3] + dy)
                crop, _ = crop_frame(f, bb, crop_size, need_padding=True)
                crops.append(crop[..., ::-1])  # BGR→RGB as tasks/classify does
                labels.append(lab)
    crops = np.stack(crops)
    labels = np.asarray(labels, np.int32)
    net = ClassifierNet("efficientnet_b0", input_size=crop_size)
    tuner = ClassifierFinetuner(net, lr=3e-4, seed=seed)
    loss, acc = tuner.fit_arrays(crops, labels, epochs=epochs, batch_size=16)
    print(f"classifier: final loss {loss:.3f} acc {acc:.3f}", flush=True)
    return net


def main():
    ap = argparse.ArgumentParser()
    # r4: 4 → 10 train videos.  With 4, the detector memorized a canonical
    # needle geometry instead of localizing the top edge (predicted box top
    # moved 0.8 px while GT moved 15 px across an insertion), which made the
    # measured length series near-constant — the root cause of r3's
    # systematic speed underestimates (VERDICT r3 items 6/9).
    # r4.2: 10 → 20 train videos and 500 → 1000 detector steps.  A saved-net
    # probe showed the 10-video/500-step detector's measured-length-vs-GT
    # slope is ~1.0 on train videos but 0.3-1.1 on held-out ones (the box
    # regression under-tracks unseen needle geometries), which compressed the
    # length series enough that the 2 mm-drop trigger never fired on 4/6
    # eval videos.
    ap.add_argument("--train_videos", type=int, default=20)
    ap.add_argument("--eval_videos", type=int, default=6)
    ap.add_argument("--det_steps", type=int, default=1000)
    ap.add_argument("--cls_epochs", type=int, default=3)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--det_model", default="yolo10n-seg",
                    help="detector registry name (yolo10s-seg to produce an "
                    "s-scale backbone for the bench's shared tracker)")
    ap.add_argument("--det_init", default=None,
                    help="skip detector training; load variables from this msgpack")
    ap.add_argument("--save_det", default=None,
                    help="save the trained detector variables (flax msgpack) — "
                    "e.g. as a TRAINED backbone for shared-pyramid tracker "
                    "training (apps/train_tracker.py --shared --backbone_init)")
    ap.add_argument("--save_cls", default=None,
                    help="save the trained classifier variables (flax msgpack) "
                    "— reusable by apps/evaluate_speed.py --cls_init")
    ap.add_argument("--out", default=None,
                    help="output doc; defaults to docs/e2e_accuracy.md for the "
                    "full protocol and docs/e2e_accuracy_quick.md for --quick "
                    "(a smoke run must never clobber the official record — "
                    "VERDICT r2 item 2)")
    args = ap.parse_args()
    if args.quick:
        args.train_videos, args.eval_videos = 2, 2
        args.det_steps, args.cls_epochs, args.frames = 150, 1, 48
    if args.out is None:
        args.out = os.path.join(
            REPO, "docs",
            "e2e_accuracy_quick.md" if args.quick else "e2e_accuracy.md",
        )

    rng = np.random.default_rng(args.seed)
    train_videos = [
        make_puncture_video(rng, n_frames=args.frames) for _ in range(args.train_videos)
    ]
    eval_videos = [
        make_puncture_video(rng, n_frames=args.frames) for _ in range(args.eval_videos)
    ]

    if args.det_init:
        import jax.numpy as jnp
        from flax import serialization

        from yolo_puncture_tpu.predict import YOLO

        det = YOLO(args.det_model, nc=1)
        template = det.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        with open(args.det_init, "rb") as f:
            det.variables = serialization.from_bytes(template, f.read())
        print(f"loaded detector from {args.det_init}", flush=True)
    else:
        det = train_detector(train_videos, steps=args.det_steps, seed=args.seed,
                             model_name=args.det_model)
    if args.save_det:
        from flax import serialization

        with open(args.save_det, "wb") as f:
            f.write(serialization.to_bytes(det.variables))
        print(f"saved trained detector variables → {args.save_det}", flush=True)
    crop_size = 96
    cls_net = train_classifier(train_videos, crop_size, epochs=args.cls_epochs,
                               seed=args.seed, det=det)
    if args.save_cls:
        from flax import serialization

        with open(args.save_cls, "wb") as f:
            f.write(serialization.to_bytes(cls_net.variables))
        print(f"saved trained classifier variables → {args.save_cls}", flush=True)

    from yolo_puncture_tpu.pipeline.runner import VideoSpeedPipeline

    pipe = VideoSpeedPipeline(det, cls_net, device_batch=8, imgsz=SIZE,
                              crop_size=crop_size)

    rows = []
    for vi, (frames, gt) in enumerate(eval_videos):
        out = pipe.process_frames(iter(frames), fps=gt["fps"], conf=0.35,
                                  judge_wnd=10)
        pred_speed = out.speed_mm_s
        rel = (abs(pred_speed - gt["speed_mm_s"]) / gt["speed_mm_s"]
               if pred_speed else None)
        rows.append({
            "video": vi + 1,
            "actual_key": gt["key_frame"],
            "pred_key": out.start_frame,
            "actual_speed": round(gt["speed_mm_s"], 3),
            "pred_speed": round(pred_speed, 3) if pred_speed else None,
            "rel_err": round(rel, 3) if rel is not None else None,
        })
        print(rows[-1], flush=True)

    errs = [r["rel_err"] for r in rows if r["rel_err"] is not None]
    mean_err = float(np.mean(errs)) if errs else None
    detected = sum(1 for r in rows if r["pred_speed"] is not None)

    # box/mask mAP of the trained detector on held-out frames (the val half of
    # the info.md:67-74 protocol, scored by the cross-checked compute_map)
    from yolo_puncture_tpu.train.metrics import compute_map

    preds, gts_eval = [], []
    for frames, gt in eval_videos:
        for t in range(0, len(frames), 8):
            r = det.predict(frames[t], conf=0.25, imgsz=SIZE, retina_masks=True)[0]
            x1, y1, x2, y2 = gt["boxes"][t]
            gmask = np.zeros((SIZE, SIZE), np.uint8)
            gmask[y1:y2, x1:x2] = 1
            preds.append({
                "boxes": r.boxes.xyxy if len(r.boxes) else np.zeros((0, 4)),
                "scores": r.boxes.conf if len(r.boxes) else np.zeros(0),
                "classes": np.zeros(len(r.boxes)),
                "masks": (np.asarray(r.masks.data) if r.masks is not None
                          and len(r.boxes) else np.zeros((0, SIZE, SIZE))),
            })
            gts_eval.append({
                "boxes": np.array([[x1, y1, x2, y2]], np.float32),
                "classes": np.zeros(1),
                "masks": gmask[None],
            })
    box_map = compute_map(preds, gts_eval, use_masks=False)
    mask_map = compute_map(preds, gts_eval, use_masks=True)
    print(f"box mAP50 {box_map['map50']:.3f} mAP50-95 {box_map['map50_95']:.3f}; "
          f"mask mAP50 {mask_map['map50']:.3f}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
            "# End-to-end speed-accuracy protocol (synthetic ground truth)\n\n"
            "Same protocol as the reference's per-video table "
            "(/root/reference/info.md:23-43), run on synthetic puncture videos "
            "with known key frames and speeds — no patient videos exist in this "
            f"environment.  Detector: {args.det_model} trained {args.det_steps} steps "
            f"on {args.train_videos} videos; classifier: efficientnet_b0 "
            f"{args.cls_epochs} epochs; pipeline: fused VideoSpeedPipeline "
            f"(imgsz {SIZE}).  Generated by tools/e2e_accuracy_eval.py.\n\n"
            "| video | actual key | pred key | actual mm/s | pred mm/s | rel err |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['video']} | {r['actual_key']} | {r['pred_key']} | "
                f"{r['actual_speed']} | {r['pred_speed']} | {r['rel_err']} |\n"
            )
        mean_s = f"{mean_err:.3f}" if mean_err is not None else "n/a"
        f.write(
            f"\nMean relative speed error: **{mean_s}** over {len(errs)} "
            f"videos ({detected}/{len(rows)} produced a speed estimate).  "
            "Reference bar on real footage: 0.10 mean (info.md:84).\n\n"
            f"Held-out detector quality (compute_map, ultralytics protocol): "
            f"box mAP50 **{box_map['map50']:.3f}** / mAP50-95 "
            f"{box_map['map50_95']:.3f}; mask mAP50 **{mask_map['map50']:.3f}** "
            f"/ mAP50-95 {mask_map['map50_95']:.3f} (reference table shape: "
            "info.md:67-74).\n"
        )
    print(json.dumps({
        "metric": "E2E synthetic speed protocol",
        "mean_rel_err": mean_err,
        "max_rel_err": float(np.max(errs)) if errs else None,
        "videos_with_estimate": detected,
        "videos_total": len(rows),
        "box_map50": round(box_map["map50"], 4),
        "mask_map50": round(mask_map["map50"], 4),
    }))


if __name__ == "__main__":
    main()
