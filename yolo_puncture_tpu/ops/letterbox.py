"""On-device letterbox preprocessing.

Reproduces ultralytics ``LetterBox`` semantics (aspect-preserving resize + centered
pad-to-square with value 114, SURVEY.md §2.2 'Letterbox preprocessing' /
§3.4 predict contract) as a fused XLA op: uint8 HWC frames go in, normalized fp
NHWC tensors come out, with no host round-trip.  The inverse mapping
(``scale_boxes``/``scale_coords``) rescales predictions back to original frame
coordinates (ultralytics ops.scale_boxes contract).

TPU note: resize is a gather-free ``jax.image.resize`` (bilinear) that XLA lowers to
MXU-friendly matmuls along each axis; pad + normalize fuse into the same program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


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
) -> Tuple[jax.Array, float, Tuple[int, int]]:
    """Letterbox a batch of frames.

    frames: (B, H, W, 3) uint8 (BGR or RGB — caller's choice) or float in [0,1].
    Returns (images (B, new, new, 3) dtype in [0,1], ratio r, (pad_left, pad_top)).
    Shapes are static → one compiled program per input geometry.
    """
    B, H, W, C = frames.shape
    r, (new_w, new_h), (left, top) = letterbox_params(H, W, new_shape, scaleup)

    x = frames.astype(jnp.float32)
    if frames.dtype == jnp.uint8:
        x = x / 255.0
    if (new_h, new_w) != (H, W):
        x = jax.image.resize(x, (B, new_h, new_w, C), method="bilinear")
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
