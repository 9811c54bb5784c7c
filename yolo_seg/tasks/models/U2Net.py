"""yolo_seg/tasks/models/U2Net.py surface (reference :319-526): the full and
small ("P") U²-Net variants as constructors over the framework's flax module
(yolo_puncture_tpu/models/u2net.py — REBNCONV/RSU blocks, 7 sigmoid outputs)."""

from yolo_puncture_tpu.models.u2net import U2Net

__all__ = ["U2NET", "U2NETP"]


def U2NET(in_ch=3, out_ch=1, **kw):
    """Full U²-Net (reference U2Net.py:319-421)."""
    return U2Net(small=False, **kw)


def U2NETP(in_ch=3, out_ch=1, **kw):
    """4.7 MB small variant (reference U2Net.py:424-526)."""
    return U2Net(small=True, **kw)
