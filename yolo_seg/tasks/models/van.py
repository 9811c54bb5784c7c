"""yolo_seg/tasks/models/van.py surface (reference :160-369): VAN backbone +
the b0–b6 registry constructors."""

from yolo_puncture_tpu.models.van import VAN  # noqa: F401
from yolo_puncture_tpu.registry import create_model

__all__ = ["VAN"] + [f"van_b{i}" for i in range(7)]


def _make(variant):
    def ctor(pretrained=False, **kw):
        kw.pop("in_chans", None)
        kw.pop("global_pool", None)
        return create_model(f"van_{variant}", **kw)

    ctor.__name__ = f"van_{variant}"
    ctor.__doc__ = f"VAN-{variant} (reference van.py:291-369 registration)."
    return ctor


for _i in range(7):
    globals()[f"van_b{_i}"] = _make(f"b{_i}")
del _make, _i
