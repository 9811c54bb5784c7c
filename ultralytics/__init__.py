"""Drop-in ``ultralytics`` import surface: the reference imports
``from ultralytics import YOLO`` (yolo_seg/app.py:7, yolo_with_deva.py:12,
dev_tools/auto_speed_calc.py); this package serves the framework's
TPU-native predictor under that name so reference user code runs unchanged.
``YOLO(weights).predict(source, conf=..., retina_masks=True, device=...)``
returns the same Results/Boxes/Masks object surface
(yolo_puncture_tpu/predict/)."""

__version__ = "0.1.0+yolo_puncture_tpu"

__all__ = ["YOLO"]


def __getattr__(name):
    # lazy: importing ultralytics must not pull in the jit predict stack
    if name == "YOLO":
        from yolo_puncture_tpu.predict import YOLO

        return YOLO
    raise AttributeError(name)
