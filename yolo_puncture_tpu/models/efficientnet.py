"""EfficientNet B0–B7 (MBConv + squeeze-excite), NHWC flax.

The reference's insertion-state classifier is timm ``efficientnet_b3`` with
num_classes=2 on 380² crops (yolo_seg/tasks/needle_clasify.py:41-65,
yolo_seg/tasks/models/efficientnet.py:5-42).  Module names mirror timm's
(conv_stem / blocks.{s}.{i}.conv_pw|conv_dw|se|conv_pwl / conv_head / classifier)
so timm ``.pth.tar`` checkpoints convert by pure name mapping
(utils/torch_convert.convert_classifier_state_dict).

TPU notes: NHWC; depthwise convs lower to VPU-friendly ops; the SE global pool +
1×1 convs and the final classifier matmul hit the MXU.  bf16 compute via ``dtype``.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_puncture_tpu.registry import register_model

Dtype = Any

# (expand_ratio, kernel, stride, channels, repeats)
_BASE_BLOCKS = [
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
]

# width_mult, depth_mult, resolution, dropout
_CFG = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def round_filters(c: int, width_mult: float, divisor: int = 8) -> int:
    c *= width_mult
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def round_repeats(n: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * n))


class _BN(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name="bn",
        )(x)


def _conv(features, k, s, groups=1, name=None, dtype=jnp.float32):
    return nn.Conv(
        features, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
        feature_group_count=groups, use_bias=False, dtype=dtype, name=name,
    )


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), use_bias=True, dtype=self.dtype, name="conv_reduce")(s)
        s = jax.nn.silu(s)
        s = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="conv_expand")(s)
        return x * jax.nn.sigmoid(s)


class DepthwiseSeparable(nn.Module):
    """timm DepthwiseSeparableConv (stage 0, expand_ratio 1)."""

    features: int
    kernel: int
    stride: int
    se_in: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        y = _conv(cin, self.kernel, self.stride, groups=cin, name="conv_dw", dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3,
                         dtype=self.dtype, name="bn1")(y)
        y = jax.nn.silu(y)
        y = SqueezeExcite(max(1, int(self.se_in * 0.25)), dtype=self.dtype, name="se")(y)
        y = _conv(self.features, 1, 1, name="conv_pw", dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3,
                         dtype=self.dtype, name="bn2")(y)
        if self.stride == 1 and cin == self.features:
            y = x + y
        return y


class InvertedResidual(nn.Module):
    """timm InvertedResidual (MBConv)."""

    features: int
    kernel: int
    stride: int
    expand_ratio: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = cin * self.expand_ratio

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-3, dtype=self.dtype, name=name)

        y = _conv(mid, 1, 1, name="conv_pw", dtype=self.dtype)(x)
        y = jax.nn.silu(bn("bn1")(y))
        y = _conv(mid, self.kernel, self.stride, groups=mid, name="conv_dw", dtype=self.dtype)(y)
        y = jax.nn.silu(bn("bn2")(y))
        y = SqueezeExcite(max(1, int(cin * 0.25)), dtype=self.dtype, name="se")(y)
        y = _conv(self.features, 1, 1, name="conv_pwl", dtype=self.dtype)(y)
        y = bn("bn3")(y)
        if self.stride == 1 and cin == self.features:
            y = x + y
        return y


class EfficientNet(nn.Module):
    variant: str = "b3"
    num_classes: int = 2
    in_chans: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width, depth, _, dropout = _CFG[self.variant]
        stem = round_filters(32, width)
        y = _conv(stem, 3, 2, name="conv_stem", dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3,
                         dtype=self.dtype, name="bn1")(y)
        y = jax.nn.silu(y)

        for s, (e, k, st, c, n) in enumerate(_BASE_BLOCKS):
            cout = round_filters(c, width)
            reps = round_repeats(n, depth)
            for i in range(reps):
                stride = st if i == 0 else 1
                if e == 1:
                    y = DepthwiseSeparable(
                        cout, k, stride, se_in=y.shape[-1], dtype=self.dtype,
                        name=f"blocks_{s}_{i}",
                    )(y, train)
                else:
                    y = InvertedResidual(
                        cout, k, stride, e, dtype=self.dtype, name=f"blocks_{s}_{i}"
                    )(y, train)

        head = round_filters(1280, width)
        y = _conv(head, 1, 1, name="conv_head", dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3,
                         dtype=self.dtype, name="bn2")(y)
        y = jax.nn.silu(y)
        y = jnp.mean(y, axis=(1, 2))
        if train and dropout > 0:
            y = nn.Dropout(dropout, deterministic=not train)(y)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(
            y.astype(self.dtype)
        )


def preprocess_classifier(images_u8, size: int = 380, dtype=jnp.float32):
    """RGB uint8 (B, H, W, 3) → resized, ImageNet-normalized (B, size, size, 3).

    Matches the torchvision transform chain of needle_clasify.py:80-84
    (Resize(380) bilinear + ToTensor + Normalize) on device.
    """
    x = images_u8.astype(jnp.float32) / 255.0
    B = x.shape[0]
    if x.shape[1:3] != (size, size):
        x = jax.image.resize(x, (B, size, size, 3), method="bilinear")
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((x - mean) / std).astype(dtype)


for _v in _CFG:
    def _ctor(num_classes=2, in_chans=3, dtype=jnp.float32, _v=_v, **kw):
        return EfficientNet(variant=_v, num_classes=num_classes, in_chans=in_chans, dtype=dtype)

    register_model(_ctor, name=f"efficientnet_{_v}")
