"""Core convolutional / attention blocks for the YOLO v8/v10/v11 family.

TPU-native design notes:
  * NHWC layout throughout (TPU conv layout; torch checkpoints are transposed on load).
  * Explicit symmetric padding ``p = k // 2`` reproducing torch Conv2d arithmetic
    exactly (XLA 'SAME' pads asymmetrically for even inputs at stride 2, which would
    break fp32 parity with reference checkpoints).
  * Every block takes a ``dtype`` (compute dtype, bf16 on TPU for speed) while params
    stay fp32; BatchNorm statistics are always fp32.
  * Submodule names mirror ultralytics state-dict keys (cv1, cv2, m_0, ...) so the
    torch→JAX converter is a pure name map.

Behavioral contracts come from the block inventory in SURVEY.md §2.2 (YOLOv10
architecture row): Conv(+BN+SiLU), C2f, SCDown, PSA, SPPF, C2fCIB for v10; C3k2 and
C2PSA for v11.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    """'same'-shape padding for odd kernels, matching torch Conv2d(p=k//2)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


def silu(x):
    return jax.nn.silu(x)


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BatchNorm + SiLU — ultralytics ``Conv``.

    BN hyperparams match ultralytics (eps=1e-3, torch momentum 0.03 → flax 0.97).
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    dilation: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = autopad(self.kernel_size, self.padding, self.dilation)
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        return silu(x) if self.act else x


class DWConv(nn.Module):
    """Depthwise Conv (groups == channels)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBN(
            self.features,
            self.kernel_size,
            self.stride,
            groups=x.shape[-1],
            act=self.act,
            dtype=self.dtype,
            name="dw",
        )(x, train)


class Bottleneck(nn.Module):
    """Standard bottleneck: cv1 → cv2 (+ residual when shortcut and shapes match)."""

    features: int
    shortcut: bool = True
    groups: int = 1
    kernels: Tuple[int, int] = (3, 3)
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.expansion)
        y = ConvBN(c_, self.kernels[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBN(
            self.features, self.kernels[1], 1, groups=self.groups, dtype=self.dtype, name="cv2"
        )(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C2f(nn.Module):
    """CSP bottleneck with two convolutions and n inner bottlenecks (dense splits)."""

    features: int
    n: int = 1
    shortcut: bool = False
    groups: int = 1
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.features * self.expansion)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(
                    c,
                    self.shortcut,
                    self.groups,
                    kernels=(3, 3),
                    expansion=1.0,
                    dtype=self.dtype,
                    name=f"m_{i}",
                )(ys[-1], train)
            )
        return ConvBN(self.features, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(ys, axis=-1), train
        )


class C3(nn.Module):
    """CSP bottleneck with three convolutions."""

    features: int
    n: int = 1
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    kernels: Tuple[int, int] = (1, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.expansion)
        a = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(
                c_,
                self.shortcut,
                self.groups,
                kernels=self.kernels,
                expansion=1.0,
                dtype=self.dtype,
                name=f"m_{i}",
            )(a, train)
        return ConvBN(self.features, 1, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


def C3k(
    features, n=1, shortcut=True, groups=1, expansion=0.5, kernel=3,
    dtype=jnp.float32, name=None,
):
    """C3 with configurable bottleneck kernel (YOLO11).  Same param structure as C3
    (torch C3k shares C3's child names, so no extra module nesting here)."""
    return C3(
        features, n, shortcut, groups, expansion,
        kernels=(kernel, kernel), dtype=dtype, name=name,
    )


class C3k2(nn.Module):
    """YOLO11 block: C2f whose inner modules are C3k (when c3k) or Bottleneck."""

    features: int
    n: int = 1
    c3k: bool = False
    expansion: float = 0.5
    groups: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.features * self.expansion)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                m = C3(
                    c, 2, self.shortcut, self.groups, kernels=(3, 3),
                    dtype=self.dtype, name=f"m_{i}",
                )
            else:
                m = Bottleneck(
                    c, self.shortcut, self.groups, kernels=(3, 3), expansion=0.5,
                    dtype=self.dtype, name=f"m_{i}",
                )
            ys.append(m(ys[-1], train))
        return ConvBN(self.features, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(ys, axis=-1), train
        )


def max_pool_same(x, k: int, stride: int = 1):
    """MaxPool2d(k, stride, padding=k//2) with torch padding arithmetic."""
    p = k // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): three stacked k=5 maxpools."""

    features: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        p1 = max_pool_same(y, self.k)
        p2 = max_pool_same(p1, self.k)
        p3 = max_pool_same(p2, self.k)
        return ConvBN(self.features, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([y, p1, p2, p3], axis=-1), train
        )


class SCDown(nn.Module):
    """YOLOv10 spatial-channel decoupled downsample: 1×1 pointwise + k×k depthwise s=2."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.features, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        return ConvBN(
            self.features,
            self.kernel_size,
            self.stride,
            groups=self.features,
            act=False,
            dtype=self.dtype,
            name="cv2",
        )(x, train)


class RepVGGDW(nn.Module):
    """Large-kernel depthwise block (7×7 dw + 3×3 dw + identity), SiLU after sum."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = ConvBN(
            self.features, 7, 1, padding=3, groups=self.features, act=False,
            dtype=self.dtype, name="conv",
        )(x, train)
        b = ConvBN(
            self.features, 3, 1, padding=1, groups=self.features, act=False,
            dtype=self.dtype, name="conv1",
        )(x, train)
        return silu(a + b + x)


class CIB(nn.Module):
    """YOLOv10 compact inverted block (dw–pw–dw–pw–dw stack, optional residual)."""

    features: int
    shortcut: bool = True
    expansion: float = 0.5
    lk: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.features * self.expansion)
        y = ConvBN(c1, 3, 1, groups=c1, dtype=self.dtype, name="cv1_0")(x, train)
        y = ConvBN(2 * c_, 1, 1, dtype=self.dtype, name="cv1_1")(y, train)
        if self.lk:
            y = RepVGGDW(2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        else:
            y = ConvBN(2 * c_, 3, 1, groups=2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        y = ConvBN(self.features, 1, 1, dtype=self.dtype, name="cv1_3")(y, train)
        y = ConvBN(
            self.features, 3, 1, groups=self.features, dtype=self.dtype, name="cv1_4"
        )(y, train)
        if self.shortcut and c1 == self.features:
            y = x + y
        return y


class C2fCIB(nn.Module):
    """C2f with CIB inner blocks (YOLOv10)."""

    features: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.features * self.expansion)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                CIB(c, self.shortcut, expansion=1.0, lk=self.lk, dtype=self.dtype, name=f"m_{i}")(
                    ys[-1], train
                )
            )
        return ConvBN(self.features, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(ys, axis=-1), train
        )


class Attention(nn.Module):
    """Partial self-attention core (ultralytics ``Attention``), NHWC.

    qkv/proj/pe are 1×1 / depthwise convs; softmax over keys. The N×N attention
    matmuls land on the MXU; XLA fuses the scale+softmax chain.
    """

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        N = H * W
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim ** -0.5
        h = self.dim + 2 * key_dim * self.num_heads

        qkv = ConvBN(h, 1, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(B, N, self.num_heads, 2 * key_dim + head_dim)
        q = qkv[..., :key_dim]
        k = qkv[..., key_dim : 2 * key_dim]
        v = qkv[..., 2 * key_dim :]

        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H, W, self.dim)

        pe = ConvBN(
            self.dim, 3, 1, groups=self.dim, act=False, dtype=self.dtype, name="pe"
        )(v.reshape(B, H, W, self.dim), train)
        return ConvBN(self.dim, 1, 1, act=False, dtype=self.dtype, name="proj")(
            out + pe, train
        )


class PSABlock(nn.Module):
    """Attention + FFN residual block (used by C2PSA and PSA)."""

    features: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = Attention(
            self.features, self.num_heads, self.attn_ratio, dtype=self.dtype, name="attn"
        )(x, train)
        x = x + a if self.shortcut else a
        f = ConvBN(self.features * 2, 1, 1, dtype=self.dtype, name="ffn_0")(x, train)
        f = ConvBN(self.features, 1, 1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        return x + f if self.shortcut else f


class PSA(nn.Module):
    """YOLOv10 partial self-attention: split channels, attend half, re-fuse."""

    features: int
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.features * self.expansion)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        b = b + Attention(c, max(1, c // 64), 0.5, dtype=self.dtype, name="attn")(b, train)
        f = ConvBN(c * 2, 1, 1, dtype=self.dtype, name="ffn_0")(b, train)
        f = ConvBN(c, 1, 1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        b = b + f
        return ConvBN(self.features, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )


class C2PSA(nn.Module):
    """YOLO11: stacked PSABlocks inside a C2-style split."""

    features: int
    n: int = 1
    expansion: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.features * self.expansion)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(
                c, 0.5, max(1, c // 64), dtype=self.dtype, name=f"m_{i}"
            )(b, train)
        return ConvBN(self.features, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )


class Proto(nn.Module):
    """Segmentation prototype generator: conv → 2× ConvTranspose upsample → conv → 1×1.

    Produces the 32-channel prototype bank consumed by the proto-mask decode
    (reference seg-head contract, SURVEY.md §2.2 'YOLO segmentation head').
    """

    c_: int = 256
    c2: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.c_, 3, 1, dtype=self.dtype, name="cv1")(x, train)
        x = nn.ConvTranspose(
            self.c_, (2, 2), strides=(2, 2), padding="VALID", use_bias=True,
            dtype=self.dtype, name="upsample",
        )(x)
        x = ConvBN(self.c_, 3, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv3")(x, train)


def upsample_nearest_2x(x):
    """Nearest-neighbor 2× upsample (exact torch nn.Upsample(scale=2) semantics)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def dfl_expectation(box_dist, reg_max: int = 16):
    """Distribution Focal Loss decode: softmax over reg_max bins → expected distance.

    box_dist: (..., 4 * reg_max) → (..., 4). fp32 softmax for numeric fidelity.
    """
    shape = box_dist.shape[:-1]
    d = box_dist.reshape(*shape, 4, reg_max).astype(jnp.float32)
    p = jax.nn.softmax(d, axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(p * bins, axis=-1)
