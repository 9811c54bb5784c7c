"""Detection / segmentation heads for the YOLO family.

Covers the three head generations used by the reference pipeline (SURVEY.md §2.2):
  * v8-style ``Detect``: DFL box regression + dense cls, NMS at postprocess.
  * v11-style ``Detect`` (legacy=False): depthwise-separable cls branch.
  * v10 ``v10Detect``: dual-assignment one-to-many + one-to-one branches; inference
    uses the one-to-one branch with top-k selection and **no NMS**
    (reference contract: SURVEY.md §3.4).
  * ``Segment``: adds a 32-prototype Proto bank + per-anchor 32 mask coefficients
    (proto-mask decode contract of yolo_seg/app.py:50,101).

All heads return a dict of raw per-level features (for the loss) plus decoded,
flattened predictions (for inference postprocess), everything batched NHWC.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_puncture_tpu.nn.common import ConvBN, Proto, dfl_expectation

Dtype = Any


def make_anchors(
    feat_shapes: Sequence[Tuple[int, int]], strides: Sequence[int], offset: float = 0.5
):
    """Anchor points (cell centers, units of stride) and per-anchor stride.

    Returns (anchors (A, 2) xy, strides (A, 1)) as fp32, concatenated over levels in
    level order — identical ordering to the flattened head outputs.
    """
    anchor_points, stride_tensor = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + offset
        sy = jnp.arange(h, dtype=jnp.float32) + offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        stride_tensor.append(jnp.full((h * w, 1), float(s), dtype=jnp.float32))
    return jnp.concatenate(anchor_points), jnp.concatenate(stride_tensor)


def dist2bbox(dist, anchor_points, xywh: bool = False):
    """ltrb distances (…, 4) + anchor centers (…, 2) → boxes (xyxy or xywh)."""
    lt, rb = dist[..., :2], dist[..., 2:]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c, wh], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(bbox_xyxy, anchor_points, reg_max: int):
    """Inverse of dist2bbox for DFL training targets, clamped to [0, reg_max-1-eps]."""
    lt = anchor_points - bbox_xyxy[..., :2]
    rb = bbox_xyxy[..., 2:] - anchor_points
    return jnp.clip(jnp.concatenate([lt, rb], axis=-1), 0, reg_max - 1 - 0.01)


class _BoxBranch(nn.Module):
    """cv2[i]: Conv(c2,3) → Conv(c2,3) → Conv2d(4*reg_max, 1)."""

    c2: int
    reg_max: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.c2, 3, 1, dtype=self.dtype, name="c0")(x, train)
        x = ConvBN(self.c2, 3, 1, dtype=self.dtype, name="c1")(x, train)
        return nn.Conv(
            4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype,
            bias_init=nn.initializers.constant(1.0), name="c2",
        )(x)


class _ClsBranch(nn.Module):
    """cv3[i].  style: 'legacy' (v8 plain convs) or 'dw' (v10/v11 depthwise-separable)."""

    c3: int
    nc: int
    style: str
    stride: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # cls bias init so initial objectness ≈ 5 objects/image at 640² (ultralytics
        # bias_init recipe) — keeps early training losses sane.
        cls_bias = math.log(5 / self.nc / (640 / self.stride) ** 2)
        if self.style == "legacy":
            x = ConvBN(self.c3, 3, 1, dtype=self.dtype, name="c0")(x, train)
            x = ConvBN(self.c3, 3, 1, dtype=self.dtype, name="c1")(x, train)
        else:
            cin = x.shape[-1]
            x = ConvBN(cin, 3, 1, groups=cin, dtype=self.dtype, name="c0_0")(x, train)
            x = ConvBN(self.c3, 1, 1, dtype=self.dtype, name="c0_1")(x, train)
            x = ConvBN(self.c3, 3, 1, groups=self.c3, dtype=self.dtype, name="c1_0")(x, train)
            x = ConvBN(self.c3, 1, 1, dtype=self.dtype, name="c1_1")(x, train)
        return nn.Conv(
            self.nc, (1, 1), use_bias=True, dtype=self.dtype,
            bias_init=nn.initializers.constant(cls_bias), name="c2",
        )(x)


class _CoeffBranch(nn.Module):
    """cv4[i]: Conv(c4,3) → Conv(c4,3) → Conv2d(nm, 1) — mask coefficients."""

    c4: int
    nm: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.c4, 3, 1, dtype=self.dtype, name="c0")(x, train)
        x = ConvBN(self.c4, 3, 1, dtype=self.dtype, name="c1")(x, train)
        return nn.Conv(self.nm, (1, 1), use_bias=True, dtype=self.dtype, name="c2")(x)


class Detect(nn.Module):
    """Multi-level detect head.

    ``one2one=True`` adds the v10 dual-assignment one-to-one branch; inference then
    decodes that branch (NMS-free).  ``cls_style`` picks the cls-branch structure.
    """

    nc: int = 80
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)
    cls_style: str = "legacy"  # 'legacy' | 'dw'
    one2one: bool = False
    dtype: Dtype = jnp.float32

    def _branches(self, feats, prefix: str, train: bool):
        ch0 = feats[0].shape[-1]
        c2 = max(16, ch0 // 4, 4 * self.reg_max)
        c3 = max(ch0, min(self.nc, 100))
        box_feats, cls_feats = [], []
        for i, f in enumerate(feats):
            box_feats.append(
                _BoxBranch(c2, self.reg_max, dtype=self.dtype, name=f"{prefix}cv2_{i}")(f, train)
            )
            cls_feats.append(
                _ClsBranch(
                    c3, self.nc, self.cls_style, float(self.strides[i]),
                    dtype=self.dtype, name=f"{prefix}cv3_{i}",
                )(f, train)
            )
        return box_feats, cls_feats

    def decode(self, box_feats, cls_feats):
        """Flatten levels → decoded xyxy boxes (input-image px) + sigmoid class probs."""
        shapes = [f.shape[1:3] for f in box_feats]
        anchors, strides = make_anchors(shapes, self.strides)
        B = box_feats[0].shape[0]
        box = jnp.concatenate(
            [f.reshape(B, -1, 4 * self.reg_max) for f in box_feats], axis=1
        )
        cls = jnp.concatenate([f.reshape(B, -1, self.nc) for f in cls_feats], axis=1)
        dist = dfl_expectation(box, self.reg_max)
        boxes = dist2bbox(dist, anchors[None], xywh=False) * strides[None]
        probs = jax.nn.sigmoid(cls.astype(jnp.float32))
        return boxes, probs

    @nn.compact
    def __call__(self, feats: List, train: bool = False):
        out = {}
        box_feats, cls_feats = self._branches(feats, "", train)
        out["box_feats"] = box_feats
        out["cls_feats"] = cls_feats
        if self.one2one:
            # v10: one-to-one branch operates on detached features during training
            # (consistent dual assignment); at inference it is the only branch used.
            o2o_in = [jax.lax.stop_gradient(f) if train else f for f in feats]
            b2, c2_ = self._branches(o2o_in, "one2one_", train)
            out["one2one_box_feats"] = b2
            out["one2one_cls_feats"] = c2_
            boxes, probs = self.decode(b2, c2_)
        else:
            boxes, probs = self.decode(box_feats, cls_feats)
        out["boxes"] = boxes    # (B, A, 4) xyxy, input-image pixels
        out["probs"] = probs    # (B, A, nc)
        return out


class Segment(Detect):
    """Detect + prototype masks: per-anchor nm coefficients and a (H/4, W/4, nm) bank."""

    nm: int = 32
    npr: int = 256

    @nn.compact
    def __call__(self, feats: List, train: bool = False):
        out = {}
        box_feats, cls_feats = self._branches(feats, "", train)
        out["box_feats"] = box_feats
        out["cls_feats"] = cls_feats

        proto = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(feats[0], train)
        out["proto"] = proto  # (B, H/4, W/4, nm)

        ch0 = feats[0].shape[-1]
        c4 = max(ch0 // 4, self.nm)
        B = feats[0].shape[0]
        coeff_feats = [
            _CoeffBranch(c4, self.nm, dtype=self.dtype, name=f"cv4_{i}")(f, train)
            for i, f in enumerate(feats)
        ]
        out["coeff_feats"] = coeff_feats
        out["coeffs"] = jnp.concatenate(
            [f.reshape(B, -1, self.nm) for f in coeff_feats], axis=1
        )

        if self.one2one:
            o2o_in = [jax.lax.stop_gradient(f) if train else f for f in feats]
            b2, c2_ = self._branches(o2o_in, "one2one_", train)
            out["one2one_box_feats"] = b2
            out["one2one_cls_feats"] = c2_
            boxes, probs = self.decode(b2, c2_)
        else:
            boxes, probs = self.decode(box_feats, cls_feats)
        out["boxes"] = boxes
        out["probs"] = probs
        return out
