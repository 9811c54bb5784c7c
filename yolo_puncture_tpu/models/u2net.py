"""U²-Net / U2NETP salient-object segmentation head, NHWC flax.

Behavioral contract from the reference model (yolo_seg/tasks/models/U2Net.py:6-526):
REBNCONV (3×3 conv, dilation, BN, ReLU), RSU7..RSU4 encoder-decoder residual
U-blocks, RSU4F fully-dilated variant, 6-level encoder + 5-level decoder, 6 side
outputs fused by a 1×1 conv; forward returns 7 sigmoid maps (fused first).
U2NETP is the 4.7 MB variant (all mids 16, widths 64).

Prediction contract (yolo_seg/tasks/unet_segment.py:53-74): take the fused output,
min-max normalize, threshold 0.5 → uint8 {0, 255}; see ``unet_predict``.

Module/attribute names mirror the torch source (stage1, rebnconvin, conv_s1…) so
state-dict conversion is a direct name map.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_puncture_tpu.registry import register_model

Dtype = Any


def _maxpool2_ceil(x):
    """MaxPool2d(2, 2, ceil_mode=True)."""
    B, H, W, C = x.shape
    ph = H % 2
    pw = W % 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, ph), (0, pw), (0, 0)),
    )


def _upsample_like(src, tgt):
    """Bilinear resize src to tgt's spatial dims (align_corners=False semantics)."""
    B, H, W, C = src.shape
    th, tw = tgt.shape[1], tgt.shape[2]
    if (H, W) == (th, tw):
        return src
    return jax.image.resize(src, (B, th, tw, C), method="bilinear")


class REBNCONV(nn.Module):
    features: int
    dirate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dirate
        y = nn.Conv(
            self.features, (3, 3), padding=[(d, d), (d, d)], kernel_dilation=(d, d),
            use_bias=True, dtype=self.dtype, name="conv_s1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn_s1",
        )(y)
        return jax.nn.relu(y)


class RSU(nn.Module):
    """Residual U-block with ``height`` levels (RSU7 → height 7 … RSU4 → height 4)."""

    height: int
    mid: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        L = self.height
        hxin = REBNCONV(self.out, 1, dtype=self.dtype, name="rebnconvin")(x, train)

        # encoder
        enc = []
        h = hxin
        for i in range(1, L):
            h = REBNCONV(self.mid, 1, dtype=self.dtype, name=f"rebnconv{i}")(h, train)
            enc.append(h)
            if i < L - 1:
                h = _maxpool2_ceil(h)
        # bottom (dilated)
        h = REBNCONV(self.mid, 2, dtype=self.dtype, name=f"rebnconv{L}")(h, train)

        # decoder
        for i in range(L - 1, 0, -1):
            skip = enc[i - 1]
            feats = self.mid if i > 1 else self.out
            h = REBNCONV(feats, 1, dtype=self.dtype, name=f"rebnconv{i}d")(
                jnp.concatenate([h, skip], axis=-1), train
            )
            if i > 1:
                h = _upsample_like(h, enc[i - 2])
        return h + hxin


class RSU4F(nn.Module):
    """Fully-dilated RSU (no pooling; dilations 1,2,4,8)."""

    mid: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNCONV(self.out, 1, dtype=self.dtype, name="rebnconvin")(x, train)
        h1 = REBNCONV(self.mid, 1, dtype=self.dtype, name="rebnconv1")(hxin, train)
        h2 = REBNCONV(self.mid, 2, dtype=self.dtype, name="rebnconv2")(h1, train)
        h3 = REBNCONV(self.mid, 4, dtype=self.dtype, name="rebnconv3")(h2, train)
        h4 = REBNCONV(self.mid, 8, dtype=self.dtype, name="rebnconv4")(h3, train)
        h3d = REBNCONV(self.mid, 4, dtype=self.dtype, name="rebnconv3d")(
            jnp.concatenate([h4, h3], axis=-1), train
        )
        h2d = REBNCONV(self.mid, 2, dtype=self.dtype, name="rebnconv2d")(
            jnp.concatenate([h3d, h2], axis=-1), train
        )
        h1d = REBNCONV(self.out, 1, dtype=self.dtype, name="rebnconv1d")(
            jnp.concatenate([h2d, h1], axis=-1), train
        )
        return h1d + hxin


class U2Net(nn.Module):
    """Full U²-Net (U2Net.py:319-421) or U2NETP (U2Net.py:424-526) via ``small``."""

    out_ch: int = 1
    small: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jax.Array, ...]:
        dt = self.dtype
        if self.small:
            s1 = RSU(7, 16, 64, dt, name="stage1")
            s2 = RSU(6, 16, 64, dt, name="stage2")
            s3 = RSU(5, 16, 64, dt, name="stage3")
            s4 = RSU(4, 16, 64, dt, name="stage4")
            s5 = RSU4F(16, 64, dt, name="stage5")
            s6 = RSU4F(16, 64, dt, name="stage6")
            s5d = RSU4F(16, 64, dt, name="stage5d")
            s4d = RSU(4, 16, 64, dt, name="stage4d")
            s3d = RSU(5, 16, 64, dt, name="stage3d")
            s2d = RSU(6, 16, 64, dt, name="stage2d")
            s1d = RSU(7, 16, 64, dt, name="stage1d")
            side_ch = [64] * 6
        else:
            s1 = RSU(7, 32, 64, dt, name="stage1")
            s2 = RSU(6, 32, 128, dt, name="stage2")
            s3 = RSU(5, 64, 256, dt, name="stage3")
            s4 = RSU(4, 128, 512, dt, name="stage4")
            s5 = RSU4F(256, 512, dt, name="stage5")
            s6 = RSU4F(256, 512, dt, name="stage6")
            s5d = RSU4F(256, 512, dt, name="stage5d")
            s4d = RSU(4, 128, 256, dt, name="stage4d")
            s3d = RSU(5, 64, 128, dt, name="stage3d")
            s2d = RSU(6, 32, 64, dt, name="stage2d")
            s1d = RSU(7, 16, 64, dt, name="stage1d")
            side_ch = [64, 64, 128, 256, 512, 512]

        hx1 = s1(x, train)
        hx = _maxpool2_ceil(hx1)
        hx2 = s2(hx, train)
        hx = _maxpool2_ceil(hx2)
        hx3 = s3(hx, train)
        hx = _maxpool2_ceil(hx3)
        hx4 = s4(hx, train)
        hx = _maxpool2_ceil(hx4)
        hx5 = s5(hx, train)
        hx = _maxpool2_ceil(hx5)
        hx6 = s6(hx, train)
        hx6up = _upsample_like(hx6, hx5)

        hx5d = s5d(jnp.concatenate([hx6up, hx5], axis=-1), train)
        hx5dup = _upsample_like(hx5d, hx4)
        hx4d = s4d(jnp.concatenate([hx5dup, hx4], axis=-1), train)
        hx4dup = _upsample_like(hx4d, hx3)
        hx3d = s3d(jnp.concatenate([hx4dup, hx3], axis=-1), train)
        hx3dup = _upsample_like(hx3d, hx2)
        hx2d = s2d(jnp.concatenate([hx3dup, hx2], axis=-1), train)
        hx2dup = _upsample_like(hx2d, hx1)
        hx1d = s1d(jnp.concatenate([hx2dup, hx1], axis=-1), train)

        def side(name, h):
            return nn.Conv(
                self.out_ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                dtype=dt, name=name,
            )(h)

        d1 = side("side1", hx1d)
        d2 = _upsample_like(side("side2", hx2d), x)
        d3 = _upsample_like(side("side3", hx3d), x)
        d4 = _upsample_like(side("side4", hx4d), x)
        d5 = _upsample_like(side("side5", hx5d), x)
        d6 = _upsample_like(side("side6", hx6), x)
        d0 = nn.Conv(self.out_ch, (1, 1), use_bias=True, dtype=dt, name="outconv")(
            jnp.concatenate([d1, d2, d3, d4, d5, d6], axis=-1)
        )
        sig = jax.nn.sigmoid
        return sig(d0), sig(d1), sig(d2), sig(d3), sig(d4), sig(d5), sig(d6)


def norm_pred(d):
    """Min-max normalize (unet_segment.normPRED, unet_segment.py:24-30)."""
    ma = jnp.max(d)
    mi = jnp.min(d)
    return (d - mi) / (ma - mi)


register_model(lambda dtype=jnp.float32, **kw: U2Net(small=False, dtype=dtype), name="u2net")
register_model(lambda dtype=jnp.float32, **kw: U2Net(small=True, dtype=dtype), name="u2netp")
