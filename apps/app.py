#!/usr/bin/env python
"""Interactive puncture-detection app — the yolo_seg/app.py surface.

``yolo_inference`` reproduces the reference pipeline (app.py:38-202): image mode →
annotated polygon overlay; video mode → per-frame detection, classification,
key-frame search, pixel→mm calibration, speed, annotated output video with ROI
boxes + U²-Net-refined mask overlays and the per-frame
``{idx} {cls} {prob} {len} …`` labels (app.py:170-176).

The gradio UI (app.py:205-325 contract: model dropdowns, conf slider 0.9 default,
judge-window slider 20) is gated behind the optional gradio import — the
environment here has no gradio; the inference function is fully usable headless.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_puncture_tpu.utils.config import get_config

CONFIG = get_config()

INIT_SHAFT_LEN = CONFIG.analytics.init_shaft_len_mm
MOVE_THRESHOLD = CONFIG.analytics.move_threshold_mm
CONFIRMATION_FRAMES = CONFIG.analytics.confirmation_frames
OUT_EXPAND = CONFIG.analytics.out_expand_px


def yolo_inference(
    image,
    video,
    yolo_model_id: str = "seg/yolo11n-seg-finetune.pt",
    unet_seg_model_id: str = "u2netp_finetune_70.pth",
    classify_model_id: str = "EfficientNet/efficientnet_b3.pth.tar",
    yolo_conf_threshold: float = 0.9,
    judge_wnd: int = 20,
    imgsz: int = 640,
    device_batch: int = 8,
    crop_size: int = 380,
    return_info: bool = False,
):
    """Image mode returns (annotated RGB image, None); video mode returns
    (None, annotated output video path).  With ``return_info`` a third element
    is appended — a dict of the pipeline's measurements (video: start/end
    frame, speed; image: detection count) — for programmatic callers like the
    web UI (the reference only printed these, app.py:180-181,194)."""
    import cv2

    from yolo_puncture_tpu.ops.geometry import create_roi_mask, polygon_to_mask
    from yolo_puncture_tpu.pipeline import VideoSpeedPipeline
    from yolo_puncture_tpu.predict import YOLO
    from yolo_puncture_tpu.tasks import ClassifierNet, UNetPredictor, unet_predict
    from yolo_puncture_tpu.utils.transform import crop_frame

    weights_root = CONFIG.PATH.WEIGHTS_PATH

    def wpath(p):
        full = os.path.join(weights_root, p)
        return full if os.path.exists(full) else p

    model = YOLO(wpath(yolo_model_id), nc=1)
    # calibration sidecar (yolo_cli calibrate): the UI's conf slider default
    # 0.9 (reference app.py:244) then reads on the calibrated P(TP) scale
    model.load_calibration(os.path.dirname(wpath(yolo_model_id)) or ".")

    if image is not None:
        results = model.predict(source=image, conf=yolo_conf_threshold, retina_masks=True, imgsz=imgsz)
        r = results[0]
        img = np.array(image)[..., ::-1].copy()  # RGB→BGR like the reference
        if r.masks is not None and len(r.masks):
            seg_coords = r.masks.xy[0]
            mask = polygon_to_mask(img.shape, seg_coords)
            img = cv2.addWeighted(img, 1, mask, 1, 0)
        if return_info:
            return img[:, :, ::-1], None, {
                "mode": "image", "detections": int(len(r.boxes.conf)),
            }
        return img[:, :, ::-1], None

    # -- video mode ---------------------------------------------------------
    unet = UNetPredictor(
        "u2netp",
        checkpoint=wpath(unet_seg_model_id) if os.path.exists(wpath(unet_seg_model_id)) else None,
    )
    cls_net = ClassifierNet(
        "efficientnet_b3",
        checkpoint=wpath(classify_model_id) if os.path.exists(wpath(classify_model_id)) else None,
    )
    pipe = VideoSpeedPipeline(model, cls_net, device_batch=device_batch, imgsz=imgsz, crop_size=crop_size)

    cap = cv2.VideoCapture(video)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(frame)
    cap.release()

    out = pipe.process_frames(frames, fps, conf=yolo_conf_threshold, judge_wnd=judge_wnd)

    output_video_path = tempfile.mktemp(suffix=".mp4")
    h, w = frames[0].shape[:2] if frames else (0, 0)
    writer = cv2.VideoWriter(
        output_video_path, cv2.VideoWriter.fourcc(*"MP4V"), fps, (w, h)
    )

    # the pipeline already ran smoothing + the insertion state machine —
    # reuse its series instead of recomputing (keeps rendering in exact sync)
    smooth = out.smooth_lens
    actual_lens = out.actual_lens

    inserted = False
    last_xyxy = None
    for idx, frame in enumerate(frames):
        cls, prob = out.classes[idx], out.probs[idx]
        rect_len = smooth[idx]
        actual_len = actual_lens[idx]
        if inserted and last_xyxy is not None:
            x1, y1, x2, y2 = last_xyxy
        else:
            x1, y1, x2, y2 = out.boxes[idx]
            x1 = max(0, x1 - OUT_EXPAND)
            y1 = max(0, y1 - OUT_EXPAND)
            x2 = min(w, x2 + OUT_EXPAND)
            y2 = min(h, y2 + OUT_EXPAND)
            last_xyxy = (x1, y1, x2, y2)
        if idx == out.start_frame:
            inserted = True
        if out.end_frame is not None and idx >= out.end_frame:
            inserted = False

        if out.end_frame is not None and idx >= out.end_frame and out.speed_mm_s:
            label = f"{idx} {cls} {prob:.2f} {out.speed_mm_s:.2f}mm/s"
        elif np.isnan(actual_len):
            label = f"{idx} {cls} {prob:.2f} -"
        else:
            label = f"{idx} {cls} {prob:.2f} {actual_len:.2f} {rect_len:.2f}"

        mask = np.zeros(frame.shape, np.uint8)
        cropped_frame, (x_lt, y_lt, x_rd, y_rd) = crop_frame(
            frame, out.boxes[idx], crop_size=crop_size
        )
        if cropped_frame.shape[0] and cropped_frame.shape[1]:
            # fixed-shape U²-Net input: edge crops vary in size and every unique
            # shape would trigger a fresh XLA compile — zero-pad to crop_size²
            # and slice the mask back (the reference's eager torch had no such
            # constraint; outputs are identical on the valid region)
            padded = np.zeros((crop_size, crop_size, 3), np.uint8)
            ch, cw = cropped_frame.shape[:2]
            padded[:ch, :cw] = cropped_frame[:crop_size, :crop_size]
            cm = unet_predict(unet, padded)
            mh, mw = y_rd - y_lt, x_rd - x_lt
            mask[y_lt:y_rd, x_lt:x_rd, 1] = cm[:mh, :mw]

        roi = create_roi_mask(frame.shape, x1, y1, x2, y2, label)
        combined = cv2.addWeighted(frame, 1, mask, 1, 0)
        combined = cv2.addWeighted(combined, 1, roi, 1, 0)
        writer.write(combined)
    writer.release()
    if out.speed_mm_s:
        print(
            f"Start: {out.start_frame} End: {out.end_frame} Speed: {out.speed_mm_s:.2f}mm/s"
        )
    if return_info:
        return None, output_video_path, {
            "mode": "video",
            "start_frame": out.start_frame,
            "end_frame": out.end_frame,
            "speed_mm_s": out.speed_mm_s,
            "fps": float(fps),
            "n_frames": len(frames),
        }
    return None, output_video_path


def build_gradio_app():
    """Gradio Blocks UI (app.py:205-325 contract). Requires gradio."""
    import gradio as gr

    with gr.Blocks() as demo:
        gr.HTML("<h1 style='text-align: center'>Puncture Detection</h1>")
        with gr.Row():
            with gr.Column():
                image = gr.Image(type="pil", label="Image", visible=False)
                video = gr.Video(label="Video", visible=True)
                input_type = gr.Radio(["Image", "Video"], value="Video", label="Input Type")
                yolo_model_id = gr.Dropdown(
                    label="YOLO Model",
                    choices=[
                        "seg/yolov8n-seg-finetune.pt",
                        "seg/yolo11n-seg-finetune.pt",
                        "seg/yolo11x-seg-finetune.pt",
                    ],
                    value="seg/yolo11n-seg-finetune.pt",
                )
                unet_seg_model_id = gr.Dropdown(
                    label="UNet Model", choices=["u2netp_finetune_70.pth"],
                    value="u2netp_finetune_70.pth",
                )
                classify_model_id = gr.Dropdown(
                    label="Classify Model",
                    choices=["EfficientNet/efficientnet_b3.pth.tar"],
                    value="EfficientNet/efficientnet_b3.pth.tar",
                )
                conf = gr.Slider(0.0, 1.0, step=0.05, value=0.9, label="Confidence Threshold")
                judge = gr.Slider(10, 40, step=5, value=20,
                                  label="Window Size for Judging Insert-starting Frame")
                btn = gr.Button(value="Detect Objects")
            with gr.Column():
                out_img = gr.Image(type="numpy", label="Annotated Image", visible=False)
                out_vid = gr.Video(label="Annotated Video", visible=True)

        def vis(t):
            im = t == "Image"
            return (
                gr.update(visible=im), gr.update(visible=not im),
                gr.update(visible=im), gr.update(visible=not im),
            )

        input_type.change(vis, [input_type], [image, video, out_img, out_vid])

        def run(image, video, ym, um, cm, conf, judge, t):
            if t == "Image":
                return yolo_inference(image, None, ym, um, cm, conf, int(judge))
            return yolo_inference(None, video, ym, um, cm, conf, int(judge))

        btn.click(
            run,
            [image, video, yolo_model_id, unet_seg_model_id, classify_model_id,
             conf, judge, input_type],
            [out_img, out_vid],
        )
    return demo


def main():
    try:
        app = build_gradio_app()
    except ImportError:
        print("gradio is not installed; use yolo_inference() directly "
              "or apps/auto_speed_calc.py for headless runs.")
        return
    app.launch(ssl_verify=False)


if __name__ == "__main__":
    main()
