"""Proto-mask decode: coefficients × prototype bank → per-instance binary masks.

Reference contract (SURVEY.md §2.2 'YOLO segmentation head', §3.4): 32 mask
coefficients per instance × (32, H/4, W/4) prototypes → sigmoid → crop to box →
threshold; ``retina_masks=True`` upsamples to native resolution before crop.

TPU-native shape: the coeff×proto contraction is one (max_det, nm) @ (nm, H·W)
matmul per image — MXU work — and the sigmoid/crop/threshold fuse behind it.
A Pallas fused variant lives in ops/pallas/proto_decode.py; this XLA version is
the portable reference path (XLA already fuses the chain into the matmul epilogue).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def crop_masks(masks: jax.Array, boxes: jax.Array) -> jax.Array:
    """Zero mask pixels outside each instance's box.

    masks: (B, N, H, W); boxes: (B, N, 4) xyxy in mask-pixel coords.
    """
    B, N, H, W = masks.shape
    ys = jnp.arange(H, dtype=boxes.dtype)[None, None, :, None]
    xs = jnp.arange(W, dtype=boxes.dtype)[None, None, None, :]
    x1 = boxes[..., 0][..., None, None]
    y1 = boxes[..., 1][..., None, None]
    x2 = boxes[..., 2][..., None, None]
    y2 = boxes[..., 3][..., None, None]
    inside = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
    return masks * inside.astype(masks.dtype)


def decode_masks(
    protos: jax.Array,
    coeffs: jax.Array,
    boxes: jax.Array,
    img_hw: Tuple[int, int],
    upsample: bool = True,
    threshold: Optional[float] = 0.5,
) -> jax.Array:
    """Decode instance masks at letterboxed-image resolution.

    protos: (B, Hp, Wp, nm)   prototype bank (head output)
    coeffs: (B, N, nm)        per-instance coefficients (selected anchors)
    boxes:  (B, N, 4)         xyxy in letterboxed-image pixels
    img_hw: letterboxed image (H, W)

    upsample=True is the ``retina_masks`` path: logits are computed at proto
    resolution and bilinearly upsampled to img_hw BEFORE crop+threshold, matching
    the reference's native-resolution mask fidelity.  Returns fp masks in [0,1]
    (thresholded {0,1} if ``threshold``) of shape (B, N, H, W).
    """
    B, Hp, Wp, nm = protos.shape
    H, W = img_hw
    # (B, N, nm) @ (B, nm, Hp*Wp) → (B, N, Hp*Wp): MXU matmul, fp32 accumulation
    logits = jnp.einsum(
        "bnm,bhwm->bnhw", coeffs.astype(jnp.float32), protos.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    masks = jax.nn.sigmoid(logits)
    if upsample and (Hp, Wp) != (H, W):
        masks = jax.image.resize(masks, (B, masks.shape[1], H, W), method="bilinear")
        masks = crop_masks(masks, boxes)
    else:
        scale = jnp.array([Wp / W, Hp / H, Wp / W, Hp / H], dtype=boxes.dtype)
        masks = crop_masks(masks, boxes * scale)
    if threshold is not None:
        masks = (masks > threshold).astype(jnp.float32)
    return masks


def paste_masks_to_original(
    masks: jax.Array,
    r: float,
    pad: Tuple[int, int],
    orig_hw: Tuple[int, int],
) -> jax.Array:
    """Undo the letterbox on decoded masks: crop padding, resize to original frame.

    masks: (B, N, H, W) at letterboxed resolution; returns (B, N, h0, w0).
    """
    B, N, H, W = masks.shape
    left, top = pad
    h0, w0 = orig_hw
    content_h = H - 2 * top if 2 * top < H else H
    content_w = W - 2 * left if 2 * left < W else W
    content_h = round(min(content_h, h0 * r)) or H
    content_w = round(min(content_w, w0 * r)) or W
    cropped = jax.lax.dynamic_slice(
        masks, (0, 0, top, left), (B, N, content_h, content_w)
    )
    return jax.image.resize(cropped, (B, N, h0, w0), method="bilinear")
