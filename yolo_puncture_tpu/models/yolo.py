"""YOLO v8 / v10 / v11 detection + segmentation model family.

Architectures are declared as static specs (lists of ``[from, repeats, block, args]``)
with per-scale depth/width/max-channel multipliers, mirroring the family the reference
fine-tunes (weights ``seg/yolov8n-seg-finetune.pt``, ``seg/yolo11n-seg-finetune.pt``,
``seg/yolo11x-seg-finetune.pt`` — yolo_seg/app.py:218-223 — and the YOLOv10 family of
README.md:46-53).  v10-seg variants (the BASELINE flagship, "YOLOv10-S seg") attach the
Segment prototype head to the v10 backbone with the NMS-free one-to-one branch.

The whole forward is a single XLA program: NHWC convs tile onto the MXU, PSA attention
is batched matmuls, and skip connections are static Python wiring (no dynamic control
flow under jit).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from yolo_puncture_tpu.nn.common import (
    C2PSA,
    C2f,
    C2fCIB,
    C3k2,
    ConvBN,
    PSA,
    SCDown,
    SPPF,
    upsample_nearest_2x,
)
from yolo_puncture_tpu.nn.heads import Detect, Segment
from yolo_puncture_tpu.registry import register_model

Dtype = Any


def make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(x + divisor / 2) // divisor * divisor)


# ---------------------------------------------------------------------------
# Architecture specs.  Entry: (from, repeats, block, args) — channels pre-scale.
# 'head' entries reference earlier layer outputs by index (Concat) like the
# ultralytics YAML graphs.
# ---------------------------------------------------------------------------

V8_SPEC = [
    # backbone
    (-1, 1, "Conv", (64, 3, 2)),        # 0 P1/2
    (-1, 1, "Conv", (128, 3, 2)),       # 1 P2/4
    (-1, 3, "C2f", (128, True)),        # 2
    (-1, 1, "Conv", (256, 3, 2)),       # 3 P3/8
    (-1, 6, "C2f", (256, True)),        # 4
    (-1, 1, "Conv", (512, 3, 2)),       # 5 P4/16
    (-1, 6, "C2f", (512, True)),        # 6
    (-1, 1, "Conv", (1024, 3, 2)),      # 7 P5/32
    (-1, 3, "C2f", (1024, True)),       # 8
    (-1, 1, "SPPF", (1024, 5)),         # 9
    # head
    (-1, 1, "Upsample", ()),            # 10
    ((-1, 6), 1, "Concat", ()),         # 11
    (-1, 3, "C2f", (512, False)),       # 12
    (-1, 1, "Upsample", ()),            # 13
    ((-1, 4), 1, "Concat", ()),         # 14
    (-1, 3, "C2f", (256, False)),       # 15 P3
    (-1, 1, "Conv", (256, 3, 2)),       # 16
    ((-1, 12), 1, "Concat", ()),        # 17
    (-1, 3, "C2f", (512, False)),       # 18 P4
    (-1, 1, "Conv", (512, 3, 2)),       # 19
    ((-1, 9), 1, "Concat", ()),         # 20
    (-1, 3, "C2f", (1024, False)),      # 21 P5
    ((15, 18, 21), 1, "HEAD", ()),      # 22
]

def _v10_spec(scale: str):
    # n/s use a large-kernel CIB in the last head stage; s+ swap backbone stage 8
    # to CIB — but ONLY s keeps the large kernel there (yolov10m/b/l/x yamls say
    # C2fCIB [1024, True]; lk=True would build RepVGGDW and break .pt loading).
    if scale == "n":
        bb8 = ("C2f", (1024, True))
    elif scale == "s":
        bb8 = ("C2fCIB", (1024, True, True))
    else:
        bb8 = ("C2fCIB", (1024, True))
    # rank-guided CIB allocation grows with scale (yolov10 yamls); validated by
    # matching the published fused param counts to <0.05%: n 2.31M s 7.28M
    # m 15.39M b 19.10M l 24.42M x 29.54M (tests/test_models_yolo.py)
    bb6 = ("C2fCIB", (512, True)) if scale == "x" else ("C2f", (512, True))
    h13 = ("C2fCIB", (512, True)) if scale in ("b", "l", "x") else ("C2f", (512, False))
    if scale in ("n", "s"):
        h19 = ("C2f", (512, False))
        h22 = ("C2fCIB", (1024, True, True))
    else:
        h19 = ("C2fCIB", (512, True))
        h22 = ("C2fCIB", (1024, True))
    return [
        (-1, 1, "Conv", (64, 3, 2)),        # 0
        (-1, 1, "Conv", (128, 3, 2)),       # 1
        (-1, 3, "C2f", (128, True)),        # 2
        (-1, 1, "Conv", (256, 3, 2)),       # 3
        (-1, 6, "C2f", (256, True)),        # 4
        (-1, 1, "SCDown", (512, 3, 2)),     # 5
        (-1, 6, bb6[0], bb6[1]),            # 6
        (-1, 1, "SCDown", (1024, 3, 2)),    # 7
        (-1, 3, bb8[0], bb8[1]),            # 8
        (-1, 1, "SPPF", (1024, 5)),         # 9
        (-1, 1, "PSA", (1024,)),            # 10
        (-1, 1, "Upsample", ()),            # 11
        ((-1, 6), 1, "Concat", ()),         # 12
        (-1, 3, h13[0], h13[1]),            # 13
        (-1, 1, "Upsample", ()),            # 14
        ((-1, 4), 1, "Concat", ()),         # 15
        (-1, 3, "C2f", (256, False)),       # 16 P3
        (-1, 1, "Conv", (256, 3, 2)),       # 17
        ((-1, 13), 1, "Concat", ()),        # 18
        (-1, 3, h19[0], h19[1]),            # 19 P4
        (-1, 1, "SCDown", (512, 3, 2)),     # 20
        ((-1, 10), 1, "Concat", ()),        # 21
        (-1, 3, h22[0], h22[1]),            # 22 P5
        ((16, 19, 22), 1, "HEAD", ()),      # 23
    ]

V11_SPEC = [
    (-1, 1, "Conv", (64, 3, 2)),               # 0
    (-1, 1, "Conv", (128, 3, 2)),              # 1
    (-1, 2, "C3k2", (256, False, 0.25)),       # 2
    (-1, 1, "Conv", (256, 3, 2)),              # 3
    (-1, 2, "C3k2", (512, False, 0.25)),       # 4
    (-1, 1, "Conv", (512, 3, 2)),              # 5
    (-1, 2, "C3k2", (512, True)),              # 6
    (-1, 1, "Conv", (1024, 3, 2)),             # 7
    (-1, 2, "C3k2", (1024, True)),             # 8
    (-1, 1, "SPPF", (1024, 5)),                # 9
    (-1, 2, "C2PSA", (1024,)),                 # 10
    (-1, 1, "Upsample", ()),                   # 11
    ((-1, 6), 1, "Concat", ()),                # 12
    (-1, 2, "C3k2", (512, False)),             # 13
    (-1, 1, "Upsample", ()),                   # 14
    ((-1, 4), 1, "Concat", ()),                # 15
    (-1, 2, "C3k2", (256, False)),             # 16 P3
    (-1, 1, "Conv", (256, 3, 2)),              # 17
    ((-1, 13), 1, "Concat", ()),               # 18
    (-1, 2, "C3k2", (512, False)),             # 19 P4
    (-1, 1, "Conv", (512, 3, 2)),              # 20
    ((-1, 10), 1, "Concat", ()),               # 21
    (-1, 2, "C3k2", (1024, True)),             # 22 P5
    ((16, 19, 22), 1, "HEAD", ()),             # 23
]

# scale → (depth, width, max_channels)
SCALES = {
    "v8": {
        "n": (0.33, 0.25, 1024), "s": (0.33, 0.50, 1024), "m": (0.67, 0.75, 768),
        "l": (1.00, 1.00, 512), "x": (1.00, 1.25, 512),
    },
    "v10": {
        "n": (0.33, 0.25, 1024), "s": (0.33, 0.50, 1024), "m": (0.67, 0.75, 768),
        "b": (0.67, 1.00, 512), "l": (1.00, 1.00, 512), "x": (1.00, 1.25, 512),
    },
    "v11": {
        "n": (0.50, 0.25, 1024), "s": (0.50, 0.50, 1024), "m": (0.50, 1.00, 512),
        "l": (1.00, 1.00, 512), "x": (1.00, 1.50, 512),
    },
}

# v11 C3k2 flips c3k=True for m/l/x even where the spec says False.
_V11_FORCE_C3K = {"m", "l", "x"}


class YOLOModel(nn.Module):
    """Spec-driven YOLO graph.

    __call__(images NHWC in [0,1]) → head output dict (see nn/heads.py) plus
    intermediate P3/P4/P5 features under 'pyramid' (reused by the tracker).
    """

    version: str = "v10"          # 'v8' | 'v10' | 'v11'
    scale: str = "s"
    nc: int = 80
    task: str = "segment"         # 'detect' | 'segment'
    dtype: Dtype = jnp.float32

    def _spec(self):
        if self.version == "v8":
            return V8_SPEC
        if self.version == "v10":
            return _v10_spec(self.scale)
        if self.version == "v11":
            return V11_SPEC
        raise ValueError(f"unknown version {self.version}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth, width, max_ch = SCALES[self.version][self.scale]
        spec = self._spec()

        def scale_ch(c):
            return make_divisible(min(c, max_ch) * width, 8)

        outputs: List = []
        saved: Dict[int, Any] = {}
        # indices needed later (multi-input layers + head inputs)
        needed = set()
        for frm, _, block, _ in spec:
            if isinstance(frm, tuple):
                needed.update(i for i in frm if i != -1)

        head_out = None
        pyramid = {}
        for i, (frm, n, block, args) in enumerate(spec):
            n_scaled = max(round(n * depth), 1) if n > 1 else n
            if isinstance(frm, tuple):
                inputs = [x if j == -1 else saved[j] for j in frm]
            else:
                inputs = [x if frm == -1 else saved[frm]]

            if block == "Conv":
                c, k, s = args
                x = ConvBN(scale_ch(c), k, s, dtype=self.dtype, name=f"model_{i}")(
                    inputs[0], train
                )
            elif block == "C2f":
                c, shortcut = args[0], args[1]
                x = C2f(scale_ch(c), n_scaled, shortcut, dtype=self.dtype, name=f"model_{i}")(
                    inputs[0], train
                )
            elif block == "C2fCIB":
                c = scale_ch(args[0])
                shortcut = args[1]
                lk = args[2] if len(args) > 2 else False
                x = C2fCIB(c, n_scaled, shortcut, lk, dtype=self.dtype, name=f"model_{i}")(
                    inputs[0], train
                )
            elif block == "C3k2":
                c = scale_ch(args[0])
                c3k = args[1] or self.scale in _V11_FORCE_C3K
                e = args[2] if len(args) > 2 else 0.5
                x = C3k2(c, n_scaled, c3k, e, dtype=self.dtype, name=f"model_{i}")(
                    inputs[0], train
                )
            elif block == "SPPF":
                c, k = args
                x = SPPF(scale_ch(c), k, dtype=self.dtype, name=f"model_{i}")(inputs[0], train)
            elif block == "SCDown":
                c, k, s = args
                x = SCDown(scale_ch(c), k, s, dtype=self.dtype, name=f"model_{i}")(
                    inputs[0], train
                )
            elif block == "PSA":
                x = PSA(scale_ch(args[0]), dtype=self.dtype, name=f"model_{i}")(inputs[0], train)
            elif block == "C2PSA":
                x = C2PSA(scale_ch(args[0]), n_scaled, dtype=self.dtype, name=f"model_{i}")(
                    inputs[0], train
                )
            elif block == "Upsample":
                x = upsample_nearest_2x(inputs[0])
            elif block == "Concat":
                x = jnp.concatenate(inputs, axis=-1)
            elif block == "HEAD":
                pyramid = {"P3": inputs[0], "P4": inputs[1], "P5": inputs[2]}
                one2one = self.version == "v10"
                cls_style = "legacy" if self.version == "v8" else "dw"
                if self.task == "segment":
                    head = Segment(
                        nc=self.nc,
                        cls_style=cls_style,
                        one2one=one2one,
                        npr=scale_ch(256),
                        dtype=self.dtype,
                        name=f"model_{i}",
                    )
                else:
                    head = Detect(
                        nc=self.nc,
                        cls_style=cls_style,
                        one2one=one2one,
                        dtype=self.dtype,
                        name=f"model_{i}",
                    )
                head_out = head(inputs, train)
            else:
                raise ValueError(f"unknown block {block}")
            if i in needed:
                saved[i] = x

        head_out["pyramid"] = pyramid
        return head_out


def _make(version, scale, task):
    def ctor(nc: int = 80, dtype=jnp.float32, task_override: Optional[str] = None):
        return YOLOModel(
            version=version, scale=scale, nc=nc, task=task_override or task, dtype=dtype
        )

    return ctor


for _v, _scales in (("v8", "nsmlx"), ("v10", "nsmblx"), ("v11", "nsmlx")):
    for _s in _scales:
        _num = _v[1:]
        register_model(_make(_v, _s, "detect"), name=f"yolo{_num}{_s}")
        register_model(_make(_v, _s, "segment"), name=f"yolo{_num}{_s}-seg")
        if _v == "v8":  # alias matching reference weight names 'yolov8n-seg'
            register_model(_make(_v, _s, "segment"), name=f"yolov8{_s}-seg")
            register_model(_make(_v, _s, "detect"), name=f"yolov8{_s}")
        if _v == "v10":
            register_model(_make(_v, _s, "detect"), name=f"yolov10{_s}")
            register_model(_make(_v, _s, "segment"), name=f"yolov10{_s}-seg")
