"""Fused batched video pipeline: the TPU restructure of the reference's per-frame
loops (SURVEY.md §7 guiding restructure; replaces yolo_seg/app.py:85-191 /
dev_tools/auto_speed_calc.py:56-122 three-pass host loops).

ONE jitted program per frame batch runs: letterbox → YOLO seg forward → best-box
selection → proto-mask decode of the best instance → 380² crop around the box →
EfficientNet insertion classifier.  Host work is reduced to: video decode, the
sequential last-box fallback (app.py:106-112 contract), polygon extraction +
min-area-rect on the per-frame best mask, key-frame voting, smoothing, and the
insertion state machine — all O(frames) scalar work.

Parallel scaling: `device_batch` frames per step on one chip; multi-chip scaling
shards the frame batch over a data mesh (parallel/mesh.py) and multi-video batches
across chips (BASELINE config 5).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_puncture_tpu.analytics.keyframe import find_insert_start, fix_class_prob
from yolo_puncture_tpu.analytics.speed import SpeedResult, insertion_state_machine
from yolo_puncture_tpu.models.efficientnet import preprocess_classifier
from yolo_puncture_tpu.ops.geometry import mask_to_polygons, min_rect_len
from yolo_puncture_tpu.ops.letterbox import letterbox, scale_boxes
from yolo_puncture_tpu.ops.masks import decode_masks
from yolo_puncture_tpu.ops.nms import select_detections
from yolo_puncture_tpu.ops.signal import gaussian_smoothing
from yolo_puncture_tpu.predict.predictor import YOLO


@dataclasses.dataclass
class PipelineOutput:
    start_frame: Optional[int]
    end_frame: Optional[int]
    speed_mm_s: Optional[float]
    lens: List[float]              # per-frame min-rect pixel length (orig coords)
    smooth_lens: List[float]       # gaussian-smoothed lens (the series the state machine saw)
    actual_lens: List[float]       # calibrated mm lengths (NaN before calibration)
    classes: List[int]
    probs: List[float]
    boxes: List[Tuple[int, int, int, int]]
    detected: List[bool]
    fps: float


class VideoSpeedPipeline:
    """End-to-end needle-speed analysis (auto_speed_calc semantics, batched)."""

    def __init__(
        self,
        detector: YOLO,
        classifier=None,
        device_batch: int = 8,
        imgsz: int = 640,
        crop_size: int = 380,
        dtype=jnp.float32,
    ):
        self.detector = detector
        self.classifier = classifier
        self.device_batch = device_batch
        self.imgsz = imgsz
        self.crop_size = crop_size
        self.dtype = dtype
        self._compiled: Dict[Tuple, Any] = {}
        from yolo_puncture_tpu.utils.profiling import StageTimer

        self.timer = StageTimer()

    # ------------------------------------------------------------------
    def _step_fn(self, orig_hw: Tuple[int, int]):
        """Fused device step for one frame-batch geometry."""
        key = orig_hw
        if key in self._compiled:
            return self._compiled[key]

        h0, w0 = orig_hw
        imgsz = self.imgsz
        crop = self.crop_size
        det_model = self.detector.model
        nms_free = self.detector.version == "v10"
        cls_net = self.classifier

        def run(det_vars, cls_vars, frames_u8, conf):
            B = frames_u8.shape[0]
            # BGR→RGB folds into letterbox AFTER the downscale (≈4× less traffic)
            imgs, r, pad = letterbox(
                frames_u8, imgsz, dtype=det_model.dtype, bgr_to_rgb=True
            )
            out = det_model.apply(det_vars, imgs)
            det = select_detections(
                out, nms_free=nms_free, conf_thres=conf, iou_thres=0.7, max_det=8
            )
            # best instance = argmax conf (app.py:97); slot 0 is max-score already
            best_valid = det["valid"][:, 0]
            best_box_lb = det["boxes"][:, 0]          # letterboxed coords
            best_conf = det["scores"][:, 0]
            best_box = scale_boxes(best_box_lb, r, pad, (h0, w0))

            masks = None
            if "coeffs" in det:
                coeffs = det["coeffs"][:, :1]
                m = decode_masks(
                    out["proto"], coeffs, det["boxes"][:, :1], (imgsz, imgsz),
                    upsample=True, threshold=0.5,
                )  # (B, 1, imgsz, imgsz) at letterbox res
                masks = m[:, 0].astype(jnp.uint8)

            result = {
                "valid": best_valid,
                "conf": best_conf,
                "box": best_box,
                "mask_lb": masks,
                "ratio": jnp.float32(r),
                "pad": jnp.array(pad, jnp.float32),
            }

            if cls_net is not None:
                # 380² crops on device with EXACT crop_frame semantics
                # (utils/transform.py:22-56): clamp window to frame bounds,
                # zero-pad truncated content at bottom/right.
                cx = ((best_box[:, 0] + best_box[:, 2]) / 2).astype(jnp.int32)
                cy = ((best_box[:, 1] + best_box[:, 3]) / 2).astype(jnp.int32)
                half = crop // 2
                x1 = jnp.maximum(cx - half, 0)
                y1 = jnp.maximum(cy - half, 0)
                x2 = jnp.minimum(cx + half, w0)
                y2 = jnp.minimum(cy + half, h0)
                wv = jnp.maximum(x2 - x1, 0)
                hv = jnp.maximum(y2 - y1, 0)
                # classifier crops read the ORIGINAL-resolution frames (the
                # detector path only sees the letterboxed downscale)
                rgb = frames_u8[..., ::-1]
                padded = jnp.pad(rgb, ((0, 0), (0, crop), (0, crop), (0, 0)))

                def crop_one(img, yy, xx, hh, ww):
                    c = jax.lax.dynamic_slice(img, (yy, xx, 0), (crop, crop, 3))
                    rows = jnp.arange(crop)[:, None, None] < hh
                    cols = jnp.arange(crop)[None, :, None] < ww
                    return jnp.where(rows & cols, c, 0)

                crops = jax.vmap(crop_one)(padded, y1, x1, hv, wv)
                x = preprocess_classifier(crops, cls_net.input_size, cls_net.model.dtype)
                logits = cls_net.model.apply(cls_vars, x)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                result["cls"] = jnp.argmax(probs, axis=-1)
                result["cls_prob"] = jnp.max(probs, axis=-1)
            return result

        fn = jax.jit(run)
        self._compiled[key] = fn
        return fn

    # ------------------------------------------------------------------
    def process_frames(
        self,
        frames: Iterable[np.ndarray],
        fps: float,
        conf: float = 0.35,
        judge_wnd: int = 20,
    ) -> PipelineOutput:
        """Run the full analysis over BGR uint8 frames.

        Double-buffered device loop (VERDICT r4 item 7): batch i's H2D upload
        and compute are SUBMITTED (JAX async dispatch) before batch i-1's
        outputs are fetched, so host decode/stacking of batch i+1 and the
        device_get of batch i-1 overlap batch i's transport+compute — e2e
        throughput ≈ max(device stage, transport) instead of their serial sum
        (the reference's per-frame loop serializes all three,
        auto_speed_calc.py:56-84)."""
        if getattr(self.detector, "conf_calib", None) is not None:
            # calibration sidecar present (yolo_cli calibrate): `conf` is on
            # the calibrated P(TP) scale — map to the raw-score threshold the
            # fused program compares against
            conf = self.detector._calib_to_raw(conf, self.detector.conf_calib)
        B = self.device_batch
        batch: List[np.ndarray] = []
        raw: List[Dict[str, np.ndarray]] = []
        undetected_frames: Dict[int, np.ndarray] = {}
        step = None
        orig_hw: Optional[Tuple[int, int]] = None
        inflight: Optional[Tuple[Any, int, List[np.ndarray]]] = None

        def drain():
            nonlocal inflight
            if inflight is None:
                return
            handles, n, host_frames = inflight
            inflight = None
            with self.timer.stage("device_fetch"):
                out = jax.device_get(handles)
            for i in range(n):
                rec = {}
                for k, v in out.items():
                    rec[k] = v if (v is None or k in ("ratio", "pad")) else v[i]
                raw.append(rec)
                if not bool(rec["valid"]):
                    # classifier must see the crop around the FALLBACK box
                    # (reference crops around yolo_pred_xyxy incl. last-box reuse,
                    # needle_clasify.py:151-154) — re-classify these on host later
                    undetected_frames[len(raw) - 1] = host_frames[i].copy()

        def flush():
            nonlocal step, orig_hw, inflight
            if not batch:
                return
            n = len(batch)
            arr = np.stack(batch)
            orig_hw = arr.shape[1:3]
            if n < B:
                arr = np.concatenate([arr, np.zeros((B - n, *arr.shape[1:]), arr.dtype)])
            if step is None:
                step = self._step_fn(arr.shape[1:3])
            cls_vars = self.classifier.variables if self.classifier else None
            with self.timer.stage("device_submit"):
                dev = jax.device_put(arr)
                handles = step(
                    self.detector.variables, cls_vars, dev, jnp.float32(conf)
                )
            new = (handles, n, list(batch))
            batch.clear()
            drain()  # fetch batch i-1 while batch i transfers/computes
            inflight = new

        for f in frames:
            batch.append(f)
            if len(batch) == B:
                flush()
        flush()
        drain()

        return self._host_pass(raw, undetected_frames, orig_hw, fps, judge_wnd)

    def _host_pass(
        self,
        raw: List[Dict[str, np.ndarray]],
        undetected_frames: Dict[int, np.ndarray],
        orig_hw,
        fps: float,
        judge_wnd: int,
    ) -> PipelineOutput:
        n = len(raw)
        if n == 0:
            return PipelineOutput(None, None, None, [], [], [], [], [], [], [], fps)

        # host pass: last-box/last-length fallback chain (app.py:106-112)
        host_timer = self.timer.stage("host_geometry")
        host_timer.__enter__()
        lens: List[float] = []
        boxes: List[Tuple[int, int, int, int]] = []
        detected: List[bool] = []
        last_box = None
        last_len = 0.0
        r = float(raw[0]["ratio"])
        h0, w0 = orig_hw
        for item in raw:
            if bool(item["valid"]):
                box = tuple(int(v) for v in item["box"])
                last_box = box
                poly = mask_to_polygons(item["mask_lb"], largest_only=True)
                if len(poly):
                    # polygon at letterbox res → original coords
                    pad = item["pad"]
                    poly = (poly - np.asarray(pad, np.float32)) / r
                    length, _ = min_rect_len(poly)
                else:
                    length = 0.0
                last_len = length
                lens.append(length)
                boxes.append(box)
                detected.append(True)
            else:
                boxes.append(last_box if last_box is not None else (0, 0, w0, h0))
                lens.append(last_len)
                detected.append(False)
        host_timer.__exit__(None, None, None)

        # classifier outputs
        if self.classifier is not None:
            classes = [int(item["cls"]) for item in raw]
            probs = [float(item["cls_prob"]) for item in raw]
            if undetected_frames:
                # re-run the classifier for dropout frames with the fallback boxes
                idxs = sorted(undetected_frames)
                sub_frames = [undetected_frames[i] for i in idxs]
                sub_boxes = [boxes[i] for i in idxs]
                from yolo_puncture_tpu.utils.transform import crop_frames_batch

                # crop first, flip channels on the 380^2 crops only (stacking/
                # flipping whole frames would copy every dropout frame at full
                # resolution — same fix as tasks/classify.py)
                crops = crop_frames_batch(
                    sub_frames, np.asarray(sub_boxes), self.classifier.input_size
                )[..., ::-1]
                c_idx, c_p = self.classifier.predict(crops)
                for j, i in enumerate(idxs):
                    classes[i] = int(c_idx[j])
                    probs[i] = float(c_p[j])
            insert_start = find_insert_start(classes, probs, judge_wnd)
            classes, probs = fix_class_prob(classes, probs, insert_start)
        else:
            classes = [0] * n
            probs = [0.0] * n
            insert_start = 0

        smooth = gaussian_smoothing(lens)
        res: SpeedResult = insertion_state_machine(
            classes, smooth, detected, insert_start, fps
        )
        return PipelineOutput(
            start_frame=res.start_frame,
            end_frame=res.end_frame,
            speed_mm_s=res.speed_mm_s,
            lens=lens,
            smooth_lens=[float(v) for v in smooth],
            actual_lens=[float(v) for v in res.actual_lens],
            classes=classes,
            probs=probs,
            boxes=boxes,
            detected=detected,
            fps=fps,
        )

    def process_video(self, video_path: str, conf: float = 0.35, judge_wnd: int = 20):
        from yolo_puncture_tpu.pipeline.video import iter_video_frames

        fps, w, h, frames = iter_video_frames(video_path)
        return self.process_frames(frames, fps, conf=conf, judge_wnd=judge_wnd)

    def process_videos(
        self,
        video_paths,
        conf: float = 0.35,
        judge_wnd: int = 20,
        interleave: bool = True,
    ):
        """Multi-video batch analytics (BASELINE config 5).

        With ``interleave`` (same-resolution videos), frames from all videos are
        zipped into shared device batches so V videos fill one chip's batch dim —
        and shard over a multi-chip 'data' mesh transparently when the arrays are
        placed on one (parallel/mesh.shard_batch).  Falls back to sequential
        per-video processing for mixed resolutions.  Returns {name: PipelineOutput}.
        """
        import os

        from yolo_puncture_tpu.pipeline.video import iter_video_frames

        metas = []
        for p in video_paths:
            fps, w, h, frames = iter_video_frames(p)
            metas.append((os.path.splitext(os.path.basename(p))[0], fps, (h, w), frames))

        results = {}
        same_res = len({m[2] for m in metas}) == 1
        if not (interleave and same_res and len(metas) > 1):
            for name, fps, _, frames in metas:
                results[name] = self.process_frames(frames, fps, conf, judge_wnd)
            return results

        # TRUE cross-video batching: round-robin one frame per live video into the
        # shared device batch (slots tagged with their owner), one fused device
        # call per batch; raw outputs scatter back per video for the sequential
        # host analytics.  On a multi-chip mesh the batch dim shards over 'data',
        # so V videos spread across chips.
        B = self.device_batch
        iters = [iter(f) for _, _, _, f in metas]
        alive = [True] * len(metas)
        per_video_raw: List[List[Dict]] = [[] for _ in metas]
        per_video_undetected: List[Dict[int, np.ndarray]] = [{} for _ in metas]
        step = None
        orig_hw = metas[0][2]
        cls_vars = self.classifier.variables if self.classifier else None

        pending: List[Tuple[int, np.ndarray]] = []  # (video_idx, frame)
        inflight = None  # (out handles, [(video_idx, frame)]) — double buffering

        def drain():
            nonlocal inflight
            if inflight is None:
                return
            handles, items = inflight
            inflight = None
            with self.timer.stage("device_fetch"):
                out = jax.device_get(handles)
            for i, (vid, frame) in enumerate(items):
                rec = {}
                for k, v in out.items():
                    rec[k] = v if (v is None or k in ("ratio", "pad")) else v[i]
                per_video_raw[vid].append(rec)
                if not bool(rec["valid"]):
                    per_video_undetected[vid][len(per_video_raw[vid]) - 1] = frame.copy()

        def flush():
            nonlocal step, inflight
            if not pending:
                return
            arr = np.stack([f for _, f in pending])
            n = len(pending)
            if n < B:
                arr = np.concatenate([arr, np.zeros((B - n, *arr.shape[1:]), arr.dtype)])
            if step is None:
                step = self._step_fn(arr.shape[1:3])
            with self.timer.stage("device_submit"):
                dev = jax.device_put(arr)
                handles = step(
                    self.detector.variables, cls_vars, dev, jnp.float32(conf)
                )
            new = (handles, list(pending))
            pending.clear()
            drain()  # fetch batch i-1 while batch i transfers/computes
            inflight = new

        while any(alive):
            for i, it in enumerate(iters):
                if not alive[i]:
                    continue
                try:
                    pending.append((i, next(it)))
                except StopIteration:
                    alive[i] = False
                    continue
                if len(pending) == B:
                    flush()
        flush()
        drain()

        for vi, (name, fps, _, _) in enumerate(metas):
            results[name] = self._host_pass(
                per_video_raw[vi], per_video_undetected[vi], orig_hw, fps, judge_wnd
            )
        return results
