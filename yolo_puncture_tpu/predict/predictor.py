"""Ultralytics-compatible Predictor: ``YOLO(weights).predict(...)`` on TPU.

Contract (SURVEY.md §2.2 row 1, §3.4): accepts ndarray / PIL / path sources, kwargs
``conf``, ``iou``, ``retina_masks``, ``imgsz``, ``device``; returns a list of
``Results`` with ``.boxes`` / ``.masks`` in original-image coordinates.

TPU-native restructure (SURVEY.md §7 guiding restructure): the whole per-frame chain
— letterbox → normalize → backbone/neck/head → NMS-free top-k (v10) or NMS (v8/v11)
→ proto-mask decode → unpad/resize to native resolution — is ONE jitted XLA program
per input geometry.  The host only decodes frames and (lazily) extracts polygons.
Batched calls amortize compile and keep the MXU fed; a compiled-program cache keyed
on (batch, H, W, imgsz) makes repeat-geometry calls zero-overhead.
"""

from __future__ import annotations

import functools
import os
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from yolo_puncture_tpu.models.yolo import YOLOModel
from yolo_puncture_tpu.ops.letterbox import letterbox, letterbox_params, scale_boxes
from yolo_puncture_tpu.ops.masks import decode_masks, paste_masks_to_original
from yolo_puncture_tpu.ops.nms import select_detections
from yolo_puncture_tpu.predict.results import Boxes, Masks, Results

_NAME_RE = re.compile(r"yolo(?:v)?(\d+)([nsmblx])(-seg)?", re.IGNORECASE)


def parse_model_name(name: str) -> Tuple[str, str, str]:
    """'seg/yolo11n-seg-finetune.pt' → ('v11', 'n', 'segment')."""
    base = os.path.basename(str(name))
    m = _NAME_RE.search(base)
    if not m:
        raise ValueError(f"cannot parse model name from '{name}'")
    version = f"v{m.group(1)}"
    if version not in ("v8", "v10", "v11"):
        raise ValueError(f"unsupported YOLO version '{version}' in '{name}'")
    task = "segment" if (m.group(3) or "seg" in base.lower()) else "detect"
    return version, m.group(2).lower(), task


class YOLO:
    """Drop-in predictor for the reference's ``YOLO(weights)`` usage.

    weights: a registry-style name ('yolo10s-seg'), a torch checkpoint path ('*.pt',
    converted via utils/torch_convert), or an orbax/msgpack params file.  Missing
    files fall back to random init (useful for shape/perf work without weights).
    """

    def __init__(
        self,
        weights: str = "yolo10s-seg",
        nc: int = 1,
        names: Optional[dict] = None,
        dtype: Any = jnp.float32,
        max_det: int = 300,
        max_masks: int = 32,
        seed: int = 0,
        int8_serving: bool = False,
    ):
        self.weights_path = str(weights)
        version, scale, task = parse_model_name(self.weights_path)
        self.version, self.scale, self.task = version, scale, task
        self.nc = nc
        self.names = names or {i: f"class{i}" for i in range(nc)}
        self.max_det = max_det
        self.max_masks = max_masks
        # int8 conv serving (nn/quant.py): s8 MXU convs inside the fused
        # pipeline; validate accuracy on your fine-tuned weights before use
        self.int8_serving = bool(int8_serving)
        self._act_scales: Optional[dict] = None  # static PTQ scales (calibrate_int8)
        # Platt confidence calibration (a, b): reported conf = σ(a·logit(s)+b)
        # ≈ P(detection is a TP | raw score s).  Lets a from-scratch checkpoint
        # run the reference's fixed operating points (0.9 UI — app.py:244, 0.35
        # batch — auto_speed_calc.py:152) at sane raw thresholds.  Fit with
        # `yolo_cli calibrate`; loaded from a checkpoint-dir sidecar
        # calibration.json via load_calibration().
        self.conf_calib: Optional[Tuple[float, float]] = None
        self.model = YOLOModel(version=version, scale=scale, nc=nc, task=task, dtype=dtype)
        self.variables = self._load_variables(seed)
        self._compiled: Dict[Tuple, Any] = {}

    def calibrate_int8(self, frames, imgsz: int = 640, percentile: float = 99.9) -> dict:
        """PTQ calibration for the int8 serving path: record per-conv
        activation scales over representative frames and freeze them, so the
        served graph uses static scales (no per-batch absmax reductions).
        Frames go through the same letterbox preprocessing as predict().
        Returns the scales dict (also stored on the predictor; recompiles
        lazily on next predict)."""
        from yolo_puncture_tpu.nn.quant import collect_act_scales
        from yolo_puncture_tpu.ops.letterbox import letterbox

        frames_list, _ = self._to_frames(frames)
        if not frames_list:
            raise ValueError("calibrate_int8 needs at least one frame")
        batches = []
        for f in frames_list:
            imgs, _, _ = letterbox(f[None], imgsz, dtype=self.model.dtype, bgr_to_rgb=True)
            batches.append(imgs)
        self._act_scales = collect_act_scales(
            lambda b: self.model.apply(self.variables, b), batches, percentile=percentile
        )
        self._compiled.clear()  # embed static scales on next compile
        return self._act_scales

    # -- confidence calibration ---------------------------------------------

    def load_calibration(self, src) -> Optional[Tuple[float, float]]:
        """Install Platt calibration from (a, b), a dict, a calibration.json
        path, or a checkpoint dir containing one.  Returns the installed pair
        (None if the sidecar does not exist — raw scores then pass through)."""
        import json

        if src is None:
            self.conf_calib = None
        elif isinstance(src, (tuple, list)):
            self.conf_calib = (float(src[0]), float(src[1]))
        elif isinstance(src, dict):
            self.conf_calib = (float(src["a"]), float(src["b"]))
        else:
            p = os.path.join(src, "calibration.json") if os.path.isdir(src) else str(src)
            if not os.path.exists(p):
                return self.conf_calib
            with open(p) as f:
                d = json.load(f)
            self.conf_calib = (float(d["a"]), float(d["b"]))
        self._compiled.clear()  # embed the constants on next compile
        return self.conf_calib

    @staticmethod
    def _calib_to_raw(conf_user: float, calib: Tuple[float, float]) -> float:
        """User-facing (calibrated) threshold → raw-score threshold."""
        import math

        a, b = calib
        p = min(max(float(conf_user), 1e-6), 1.0 - 1e-6)
        z = (math.log(p / (1.0 - p)) - b) / a
        return 1.0 / (1.0 + math.exp(-z))

    # -- weights ------------------------------------------------------------

    def _load_variables(self, seed: int):
        path = self.weights_path
        if os.path.exists(path):
            if path.endswith(".pt") or path.endswith(".pth"):
                from yolo_puncture_tpu.utils.torch_convert import load_ultralytics_checkpoint

                return load_ultralytics_checkpoint(path, self.model)
            if path.endswith(".msgpack"):
                from flax import serialization

                with open(path, "rb") as f:
                    template = self._random_init(seed)
                    return serialization.from_bytes(template, f.read())
        return self._random_init(seed)

    def _random_init(self, seed: int):
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        return jax.jit(self.model.init)(jax.random.PRNGKey(seed), x)

    # -- device pipeline ----------------------------------------------------

    def _pipeline(self, orig_hw: Tuple[int, int], imgsz: int, retina: bool):
        """Build (and cache) the fused device function for one input geometry."""
        key = (orig_hw, imgsz, retina)
        if key in self._compiled:
            return self._compiled[key]

        h0, w0 = orig_hw
        nms_free = self.version == "v10"
        model = self.model
        max_det, max_masks = self.max_det, self.max_masks
        task = self.task
        int8 = self.int8_serving
        act_scales = self._act_scales if int8 else None
        calib = self.conf_calib
        # static letterbox geometry for this (h0, w0, imgsz) — identical to the
        # values letterbox() derives inside `run`; shared with _paste/overflow
        r, _, pad = letterbox_params(h0, w0, imgsz)

        @jax.jit
        def run(variables, frames_u8, conf, iou):
            # BGR (cv2 convention, reference passes cv2 frames) → RGB on device,
            # folded into letterbox after the downscale (≈4× less traffic)
            imgs, _r, _pad = letterbox(frames_u8, imgsz, dtype=model.dtype, bgr_to_rgb=True)
            from yolo_puncture_tpu.nn.quant import int8_convs

            with int8_convs(int8, act_scales=act_scales):
                out = model.apply(variables, imgs)
            det = select_detections(
                out, nms_free=nms_free, conf_thres=conf, iou_thres=iou, max_det=max_det
            )
            scores = det["scores"]
            if calib is not None:
                # reported conf = σ(a·logit(s)+b); the threshold in `conf` is
                # already mapped to raw-score space host-side (_calib_to_raw)
                a, b = calib
                s = jnp.clip(scores, 1e-6, 1.0 - 1e-6)
                scores = jax.nn.sigmoid(a * jnp.log(s / (1.0 - s)) + b)
                scores = scores * det["valid"]
            result = {
                "boxes_lb": det["boxes"],
                "scores": scores,
                "classes": det["classes"],
                "count": det["count"],
                "valid": det["valid"],
            }
            # rescale boxes to original frame coords on device
            result["boxes"] = scale_boxes(det["boxes"], r, pad, (h0, w0)) * det[
                "valid"
            ][..., None]
            if task == "segment":
                coeffs = det["coeffs"][:, :max_masks]
                mboxes = det["boxes"][:, :max_masks]
                masks_lb = decode_masks(
                    out["proto"], coeffs, mboxes, (imgsz, imgsz),
                    upsample=False, threshold=None, crop=not retina,
                )
                result["masks"] = _paste(masks_lb, result["boxes"][:, :max_masks])
                # kept ON DEVICE (not fetched) for the rare >max_masks overflow
                result["proto"] = out["proto"]
                result["coeffs"] = det["coeffs"]
            return result

        def _paste(masks_p, boxes_orig):
            """masks_p at PROTO (stride-4) resolution → original-frame binary.

            retina (ultralytics process_mask_native semantics): ONE resample —
            slice the letterbox content at proto scale, bilinear straight to
            the original resolution, crop at ORIGINAL coords, threshold.  The
            old proto→letterbox→original double-resample cost an extra
            (N, imgsz, imgsz) intermediate and drifted mask boundaries ~10%
            IoU on thin instances vs the reference pipeline.
            Non-retina: masks arrive box-cropped at proto res already."""
            # fractional pad carried exactly: pad/4 need not be integral, and
            # paste_masks_to_original samples at float offsets (ADVICE r2)
            pad4 = (pad[0] / 4.0, pad[1] / 4.0)
            full = paste_masks_to_original(masks_p, r / 4, pad4, (h0, w0))
            if retina:
                from yolo_puncture_tpu.ops.masks import crop_masks

                full = crop_masks(full, boxes_orig.astype(full.dtype))
            return (full > 0.5).astype(jnp.uint8)

        overflow = None
        if task == "segment":

            @jax.jit
            def overflow(proto_b, coeffs_all, boxes_all, start):
                """Decode max_masks instances starting at ``start`` for ONE frame.

                Frames with more than max_masks detections (rare in this domain)
                decode the tail in fixed-size chunks through this second program;
                inputs stay device-resident from ``run`` so nothing re-uploads.
                Padding by a full chunk keeps dynamic_slice clamp-free (a clamped
                start would silently misalign mask↔box pairing near max_det).
                """
                cpad = jnp.pad(coeffs_all, ((0, max_masks), (0, 0)))
                bpad = jnp.pad(boxes_all, ((0, max_masks), (0, 0)))
                cc = jax.lax.dynamic_slice_in_dim(cpad, start, max_masks)
                bb = jax.lax.dynamic_slice_in_dim(bpad, start, max_masks)
                masks_lb = decode_masks(
                    proto_b[None], cc[None], bb[None], (imgsz, imgsz),
                    upsample=False, threshold=None, crop=not retina,
                )
                bb_orig = scale_boxes(bb[None], r, pad, (h0, w0))
                return _paste(masks_lb, bb_orig)[0]

        self._compiled[key] = (run, overflow)
        return self._compiled[key]

    # -- source normalization ----------------------------------------------

    @staticmethod
    def _to_frames(source) -> Tuple[List[np.ndarray], List[str]]:
        """Normalize source(s) to BGR uint8 HWC frames (ultralytics convention)."""

        def one(s):
            if isinstance(s, str):
                import cv2

                img = cv2.imread(s)
                if img is None:
                    raise FileNotFoundError(s)
                return img, s
            if hasattr(s, "convert"):  # PIL → RGB → BGR
                return np.asarray(s.convert("RGB"))[..., ::-1].copy(), ""
            arr = np.asarray(s)
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            return _to_u8(arr), ""

        def _to_u8(arr):
            """CONTRACT: float sources with max <= 1.0 are interpreted as
            normalized [0, 1] frames (the torch-ecosystem convention and the
            common frame/255. usage) and scaled by 255; float sources with
            values above 1.0 are treated as 0-255 scale.  A genuinely
            near-black 0-255-range float frame is indistinguishable from a
            normalized one — pass uint8 to avoid the ambiguity."""
            if arr.dtype == np.uint8:
                return arr
            a = arr.astype(np.float32)
            if np.issubdtype(arr.dtype, np.floating) and (a.size == 0 or a.max() <= 1.0):
                a = a * 255.0
            return np.clip(np.rint(a), 0, 255).astype(np.uint8)

        if isinstance(source, str) and os.path.isdir(source):
            # directory source: every image file, name-sorted (ultralytics dir mode)
            names = sorted(
                f for f in os.listdir(source)
                if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp"))
            )
            frames, paths = [], []
            for f in names:
                fr, p = one(os.path.join(source, f))
                frames.append(fr)
                paths.append(p)
            return frames, paths
        if isinstance(source, str) and source.lower().endswith(
            (".mp4", ".avi", ".mov", ".mkv")
        ):
            # video source: decode every frame (ultralytics video mode)
            import cv2

            cap = cv2.VideoCapture(source)
            if not cap.isOpened():
                raise FileNotFoundError(source)
            frames = []
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                frames.append(frame)
            cap.release()
            return frames, [source] * len(frames)
        if isinstance(source, (list, tuple)):
            if not source:  # empty batch → no results (ultralytics returns [])
                return [], []
            frames, paths = zip(*[one(s) for s in source])
            return list(frames), list(paths)
        if isinstance(source, np.ndarray) and source.ndim == 4:
            return list(_to_u8(source)), [""] * len(source)
        f, p = one(source)
        return [f], [p]

    # -- public API ---------------------------------------------------------

    def predict(
        self,
        source=None,
        conf: float = 0.25,
        iou: float = 0.7,
        imgsz: Optional[int] = None,
        retina_masks: bool = False,
        device=None,  # accepted for API parity; placement is managed by JAX
        verbose: bool = False,
        **kwargs,
    ) -> List[Results]:
        if imgsz is None:
            # deployment knob: callers that never pass imgsz (e.g. reference
            # user code running via the compat shims) can be resized globally
            imgsz = int(os.environ.get("YPT_DEFAULT_IMGSZ", "640"))
        frames, paths = self._to_frames(source)
        results: List[Results] = []
        # group consecutive same-shape frames into device batches
        i = 0
        while i < len(frames):
            j = i
            shape = frames[i].shape
            while j < len(frames) and frames[j].shape == shape:
                j += 1
            batch = np.stack(frames[i:j])
            results.extend(
                self._predict_batch(batch, paths[i:j], conf, iou, imgsz, retina_masks)
            )
            i = j
        return results

    __call__ = predict

    def _predict_batch(self, batch, paths, conf, iou, imgsz, retina):
        B, h0, w0, _ = batch.shape
        run, overflow = self._pipeline((h0, w0), imgsz, retina)
        if self.conf_calib is not None:
            conf = self._calib_to_raw(conf, self.conf_calib)
        dev = run(
            self.variables,
            jnp.asarray(batch),
            jnp.float32(conf),
            jnp.float32(iou),
        )
        # proto/coeffs/boxes_lb stay device-resident — fetched only if a frame
        # exceeds max_masks detections (overflow mask decode)
        out = jax.device_get(
            {k: v for k, v in dev.items() if k not in ("proto", "coeffs", "boxes_lb")}
        )
        results = []
        for b in range(B):
            n = int(out["count"][b])
            boxes = Boxes(
                out["boxes"][b][:n], out["scores"][b][:n], out["classes"][b][:n], (h0, w0)
            )
            masks = None
            if "masks" in out:
                mask_parts = [out["masks"][b][: min(n, self.max_masks)]]
                start = self.max_masks
                while start < n:  # rare: one box per mask beyond max_masks
                    chunk = np.asarray(
                        overflow(
                            dev["proto"][b], dev["coeffs"][b], dev["boxes_lb"][b],
                            jnp.int32(start),
                        )
                    )
                    mask_parts.append(chunk[: n - start])
                    start += self.max_masks
                masks = Masks(np.concatenate(mask_parts, axis=0), (h0, w0))
            results.append(
                Results(batch[b], boxes, masks, names=self.names, path=paths[b])
            )
        return results

    def to(self, device):  # API parity no-op
        return self
