"""yolo_seg/app.py surface (reference :25-325): the flagship image/video
inference pipeline + domain constants.  The gradio UI builder is exposed too
(gated on the optional gradio package, like apps/app.py)."""

from apps.app import (  # noqa: F401
    CONFIRMATION_FRAMES,
    INIT_SHAFT_LEN,
    MOVE_THRESHOLD,
    OUT_EXPAND,
    build_gradio_app,
    yolo_inference,
)

__all__ = [
    "yolo_inference",
    "build_gradio_app",
    "INIT_SHAFT_LEN",
    "MOVE_THRESHOLD",
    "CONFIRMATION_FRAMES",
    "OUT_EXPAND",
]
