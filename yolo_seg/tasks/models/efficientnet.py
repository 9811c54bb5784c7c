"""yolo_seg/tasks/models/efficientnet.py surface (reference :5-42): the
num_classes=2 EfficientNet registry constructors."""

from yolo_puncture_tpu.registry import create_model

__all__ = ["efficientnet_b3", "efficientnet_b4", "efficientnet_b5", "efficientnet_b7"]


def _make(variant):
    def ctor(pretrained=False, num_classes=2, **kw):
        kw.pop("in_chans", None)
        kw.pop("global_pool", None)
        return create_model(f"efficientnet_{variant}", num_classes=num_classes, **kw)

    ctor.__name__ = f"efficientnet_{variant}"
    ctor.__doc__ = f"EfficientNet-{variant.upper()} (reference efficientnet.py:5-42)."
    return ctor


efficientnet_b3 = _make("b3")
efficientnet_b4 = _make("b4")
efficientnet_b5 = _make("b5")
efficientnet_b7 = _make("b7")
