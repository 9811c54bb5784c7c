"""On-device letterbox preprocessing.

Reproduces ultralytics ``LetterBox`` semantics (aspect-preserving resize + centered
pad-to-square with value 114, SURVEY.md §2.2 'Letterbox preprocessing' /
§3.4 predict contract) as a fused XLA op: uint8 HWC frames go in, normalized fp
NHWC tensors come out, with no host round-trip.  The inverse mapping
(``scale_boxes``/``scale_coords``) rescales predictions back to original frame
coordinates (ultralytics ops.scale_boxes contract).

TPU note: every resize path is gather-free matmul resampling with cv2
INTER_LINEAR tap weights (see ``_cv2_linear_taps`` / ``_interp_matrix``);
pad + normalize + BGR flip fuse into the same program.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cv2_linear_taps(n: int):
    """cv2.resize INTER_LINEAR taps for an exact integer downscale factor n.

    cv2 samples src position (j+0.5)·n − 0.5 = n·j + (n−1)/2 with a 2-tap
    triangle kernel and NO anti-aliasing: odd n lands exactly on one pixel
    (single tap), even n halfway between the two middle pixels (½/½).  Only
    n = 2 coincides with the n-block average; matching cv2 at every n is what
    keeps fp32 parity with the ultralytics host letterbox for 1080p (n=3) and
    4K (n=6) sources.  Taps stay inside the block [n·j, n·j+n) → block-local.
    """
    if n % 2 == 1:
        return (((n - 1) // 2, 1.0),)
    return ((n // 2 - 1, 0.5), (n // 2, 0.5))


@lru_cache(maxsize=16)
def _lane_mix_matrix(W: int, new_w: int, n: int, C: int, flip_c: bool, scale: float):
    """(W·C, new_w·C) matrix: cv2 INTER_LINEAR taps along W + channel
    de-interleave (+ optional BGR→RGB) + value scaling, as one MXU contraction.

    Raw HWC frames put C (=3) in the lane dim — 3/128 lane utilization makes
    every elementwise op on them ~40× slower than the bandwidth floor.  Viewing
    the frame as (H, W·C) keeps lanes full (W·C is a multiple of 128 for common
    sizes); the W-axis resampling then mixes lanes, which is exactly a matmul.
    """
    M = np.zeros((W * C, new_w * C), np.float32)
    for wo in range(new_w):
        for dw, wt in _cv2_linear_taps(n):
            for c in range(C):
                src = (n * wo + dw) * C + c
                dst = wo * C + ((C - 1 - c) if flip_c else c)
                M[src, dst] = wt * scale
    return M  # numpy (cached); jnp.asarray at trace time — caching a traced
              # array would leak tracers across jit scopes


# output lanes per block: multiple of both 128 (MXU tile) and C — the n:1 lane
# pooling is block-local (output lanes [384b, 384b+384) read only input lanes
# [384nb, 384n(b+1))), so the dense (W·C, new_w·C) contraction factors into a
# block-diagonal batched matmul with n·384/ (W·C) of the FLOPs
_MIX_OUT_BLOCK = 384


def letterbox_params(h: int, w: int, new_shape: int, scaleup: bool = True):
    """Static resize/pad geometry for an (h, w) frame → (new_shape, new_shape).

    Matches ultralytics: r = min(new/h, new/w) (clamped to ≤1 when not scaleup);
    new_unpad = round(w*r), round(h*r); dw/dh split evenly (centered).
    Returns (r, (new_w, new_h), (left, top)).
    """
    r = min(new_shape / h, new_shape / w)
    if not scaleup:
        r = min(r, 1.0)
    new_w, new_h = round(w * r), round(h * r)
    dw, dh = (new_shape - new_w) / 2, (new_shape - new_h) / 2
    left, top = round(dw - 0.1), round(dh - 0.1)
    return r, (new_w, new_h), (left, top)


def letterbox(
    frames: jax.Array,
    new_shape: int = 640,
    pad_value: float = 114.0 / 255.0,
    dtype=jnp.float32,
    scaleup: bool = True,
    bgr_to_rgb: bool = False,
) -> Tuple[jax.Array, float, Tuple[int, int]]:
    """Letterbox a batch of frames.

    frames: (B, H, W, 3) uint8 (BGR or RGB — caller's choice) or float in [0,1].
    Returns (images (B, new, new, 3) dtype in [0,1], ratio r, (pad_left, pad_top)).
    Shapes are static → one compiled program per input geometry.

    Bandwidth design (this op reads the largest tensors in the whole pipeline —
    e.g. 354 MB of 720p uint8 per 128-frame batch): arithmetic runs in the
    TARGET dtype (uint8 → bf16 is half the traffic of fp32); an exact integer
    downscale (720p → 640², r = 1/2; 1080p → r = 1/3) lowers to cv2
    INTER_LINEAR's 1-2 taps per axis (`_cv2_linear_taps`) — pixel-parity with
    ultralytics' host letterbox AND faster than a general resize.  Non-integer
    ratios use 2-tap interpolation matmuls (also cv2-exact).  ``bgr_to_rgb``
    folds the channel flip in AFTER the downscale, where the tensor is ~4×
    smaller than flipping the raw frames at the call site.
    """
    B, H, W, C = frames.shape
    r, (new_w, new_h), (left, top) = letterbox_params(H, W, new_shape, scaleup)

    compute = dtype if dtype != jnp.float64 else jnp.float32
    inv_n = int(round(1.0 / r)) if r > 0 else 0
    exact_int_down = (
        r < 1.0
        and inv_n >= 1
        and H == new_h * inv_n
        and W == new_w * inv_n
        and abs(r * inv_n - 1.0) < 1e-9
    )
    if (new_h, new_w) == (H, W):
        x = frames.astype(compute)
        if frames.dtype == jnp.uint8:
            x = x / compute(255.0)
        if bgr_to_rgb:
            x = x[..., ::-1]
        bgr_to_rgb = False
    elif exact_int_down:
        # (H, W·C)-layout path: cv2-tap H resampling on sublanes, then one MXU
        # matmul for W taps + channel de-interleave + BGR flip + /255 — the
        # only formulation that avoids C=3-minor elementwise ops on raw frames
        # (those run at 3/128 lane utilization, ~6× slower than this).
        n = inv_n
        value_scale = 1.0 / (255.0 if frames.dtype == jnp.uint8 else 1.0)
        mix = jnp.asarray(
            _lane_mix_matrix(W, new_w, n, C, bgr_to_rgb, value_scale)
        ).astype(compute)
        bgr_to_rgb = False
        h_taps = _cv2_linear_taps(n)
        ob = _MIX_OUT_BLOCK
        if (new_w * C) % ob == 0 and C <= ob:
            nb = (new_w * C) // ob
            ib = n * ob
            # block-diagonal form of the same contraction (taps are lane-local)
            mixb = mix.reshape(nb, ib, nb, ob)[
                jnp.arange(nb), :, jnp.arange(nb), :
            ]  # (nb, ib, ob)
            # mix FIRST (the uint8→compute cast fuses into the matmul operand
            # read — no full-res float intermediate ever hits HBM), then the
            # H-taps run on the n× smaller mixed tensor as weighted slices.
            # Linear ops commute, so this is the same arithmetic as taps-first.
            x = frames.reshape(B, H, nb, ib).astype(compute)
            y = jnp.einsum(
                "bhni,nio->bhno", x, mixb, preferred_element_type=jnp.float32
            )
            y = y.reshape(B, new_h, n, nb, ob)
            s = h_taps[0][1] * y[:, :, h_taps[0][0]]
            for d, wt in h_taps[1:]:
                s = s + wt * y[:, :, d]
            x = s.astype(compute).reshape(B, new_h, new_w, C)
        else:
            x = frames.reshape(B, new_h, n, W * C).astype(compute)
            s = h_taps[0][1] * x[:, :, h_taps[0][0]]
            for d, wt in h_taps[1:]:
                s = s + wt * x[:, :, d]
            x = jax.lax.dot_general(
                s, mix, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(compute)
            x = x.reshape(B, new_h, new_w, C)
    else:
        # general ratio: cv2 INTER_LINEAR = half-pixel 2-tap interpolation with
        # NO anti-aliasing, expressed as two matmul contractions (the same
        # _interp_matrix the mask upsample uses).  jax.image.resize would
        # anti-alias on downscale — visibly different pixels from the
        # reference's host letterbox.
        from yolo_puncture_tpu.ops.masks import _interp_matrix

        x = frames.astype(compute)
        if frames.dtype == jnp.uint8:
            x = x / compute(255.0)
        mh = jnp.asarray(_interp_matrix(H, new_h)).astype(compute)
        mw = jnp.asarray(_interp_matrix(W, new_w)).astype(compute)
        x = jnp.einsum("bhwc,hH->bHwc", x, mh, preferred_element_type=jnp.float32)
        x = jnp.einsum(
            "bHwc,wW->bHWc", x.astype(compute), mw, preferred_element_type=jnp.float32
        ).astype(compute)
    if bgr_to_rgb:
        x = x[..., ::-1]
    x = jnp.pad(
        x,
        ((0, 0), (top, new_shape - new_h - top), (left, new_shape - new_w - left), (0, 0)),
        constant_values=pad_value,
    )
    return x.astype(dtype), r, (left, top)


def scale_boxes(
    boxes: jax.Array, r: float, pad: Tuple[int, int], orig_hw: Tuple[int, int]
) -> jax.Array:
    """Map xyxy boxes from letterboxed-image coords back to original frame coords."""
    left, top = pad
    h, w = orig_hw
    shift = jnp.array([left, top, left, top], dtype=boxes.dtype)
    out = (boxes - shift) / r
    lim = jnp.array([w, h, w, h], dtype=boxes.dtype)
    return jnp.clip(out, 0, lim)


def scale_coords(
    coords: jax.Array, r: float, pad: Tuple[int, int], orig_hw: Tuple[int, int]
) -> jax.Array:
    """Map (…, 2) xy points back to original frame coords."""
    left, top = pad
    h, w = orig_hw
    out = (coords - jnp.array([left, top], dtype=coords.dtype)) / r
    return jnp.clip(out, 0, jnp.array([w, h], dtype=coords.dtype))
