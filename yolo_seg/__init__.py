"""Drop-in compatibility package mirroring the reference's ``yolo_seg`` import
surface (daisy9542/yolo-puncture ``yolo_seg/``) on top of the TPU-native
framework.  User code written against the reference —

    from yolo_seg.tasks import load_classify_net, predict_images
    from yolo_seg.utils import get_coord_min_rect_len, gaussian_smoothing
    from yolo_seg.app import yolo_inference

— runs unchanged here; every symbol delegates to ``yolo_puncture_tpu``.
``device=`` arguments are accepted for signature parity and ignored (JAX
backend selection replaces the reference's cuda/mps/cpu fallback chain,
yolo_seg/app.py:30-35).
"""
