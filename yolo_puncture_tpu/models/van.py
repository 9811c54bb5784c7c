"""Visual Attention Network (VAN) b0–b6 classifier backbone, NHWC flax.

Behavioral contract from the reference model (yolo_seg/tasks/models/van.py:50-369):
LKA (5×5 dw conv → 7×7 dilated dw conv d=3 → 1×1, gated ``u * attn``), Attention
(proj_1 → GELU → LKA → proj_2, residual), Block (BN + attn + layer-scale residual,
BN + conv-MLP + layer-scale residual), OverlapPatchEmbed (7×7/4 then 3×3/2 + BN),
4 stages with per-stage LayerNorm, mean-pooled head.  Registered as van_b0..b6 like
the reference's timm registration (van.py:291-369).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_puncture_tpu.registry import register_model

Dtype = Any

_CFG = {
    "b0": ((32, 64, 160, 256), (3, 3, 5, 2)),
    "b1": ((64, 128, 320, 512), (2, 2, 4, 2)),
    "b2": ((64, 128, 320, 512), (3, 3, 12, 3)),
    "b3": ((64, 128, 320, 512), (3, 5, 27, 3)),
    "b4": ((64, 128, 320, 512), (3, 6, 40, 3)),
    "b5": ((96, 192, 480, 768), (3, 3, 24, 3)),
    "b6": ((96, 192, 384, 768), (6, 6, 90, 6)),
}


def _bn(train, dtype, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name
    )


class LKA(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        u = x
        a = nn.Conv(
            self.dim, (5, 5), padding=[(2, 2), (2, 2)], feature_group_count=self.dim,
            dtype=self.dtype, name="conv0",
        )(x)
        a = nn.Conv(
            self.dim, (7, 7), padding=[(9, 9), (9, 9)], kernel_dilation=(3, 3),
            feature_group_count=self.dim, dtype=self.dtype, name="conv_spatial",
        )(a)
        a = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv1")(a)
        return u * a


class VanAttention(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="proj_1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = LKA(self.dim, dtype=self.dtype, name="spatial_gating_unit")(y)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="proj_2")(y)
        return y + shortcut


class VanMlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.hidden, (1, 1), dtype=self.dtype, name="fc1")(x)
        y = nn.Conv(
            self.hidden, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=self.hidden,
            dtype=self.dtype, name="dwconv",
        )(y)
        y = jax.nn.gelu(y, approximate=False)
        return nn.Conv(self.out, (1, 1), dtype=self.dtype, name="fc2")(y)


class VanBlock(nn.Module):
    dim: int
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-2), (self.dim,))
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-2), (self.dim,))
        y = _bn(train, self.dtype, "norm1")(x)
        y = VanAttention(self.dim, dtype=self.dtype, name="attn")(y)
        x = x + ls1 * y
        y = _bn(train, self.dtype, "norm2")(x)
        y = VanMlp(self.dim * self.mlp_ratio, self.dim, dtype=self.dtype, name="mlp")(y)
        return x + ls2 * y


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch // 2
        y = nn.Conv(
            self.dim, (self.patch, self.patch), strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)], dtype=self.dtype, name="proj",
        )(x)
        return _bn(train, self.dtype, "norm")(y)


class VAN(nn.Module):
    variant: str = "b0"
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims, depths = _CFG[self.variant]
        # per-stage MLP ratios [8, 8, 4, 4] — every reference variant b0–b6
        # uses this schedule (van.py:294-351); a constant 4 would shrink the
        # stage-1/2 MLPs and break .pth.tar weight loading
        mlp_ratios = (8, 8, 4, 4)
        for s in range(4):
            x = OverlapPatchEmbed(
                dims[s], patch=7 if s == 0 else 3, stride=4 if s == 0 else 2,
                dtype=self.dtype, name=f"patch_embed{s + 1}",
            )(x, train)
            for i in range(depths[s]):
                x = VanBlock(
                    dims[s], mlp_ratio=mlp_ratios[s], dtype=self.dtype,
                    name=f"block{s + 1}_{i}",
                )(x, train)
            x = nn.LayerNorm(dtype=self.dtype, name=f"norm{s + 1}")(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


for _v in _CFG:
    def _ctor(num_classes=2, dtype=jnp.float32, _v=_v, **kw):
        return VAN(variant=_v, num_classes=num_classes, dtype=dtype)

    register_model(_ctor, name=f"van_{_v}")
