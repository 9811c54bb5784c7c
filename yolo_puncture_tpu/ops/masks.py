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

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def _interp_matrix(src: int, dst: int, window=None) -> np.ndarray:
    """(src, dst) bilinear interpolation matrix, half-pixel centers (the same
    sampling jax.image.resize/cv2 use for upscaling).  Lets the mask upsample
    run as two MXU matmuls instead of a gather-based resize.  Returns numpy
    (cached); converted to a device constant at trace time.

    ``window=(lo, hi)`` (source-pixel units, fractional allowed) samples only
    that source span — used to read the letterbox CONTENT region out of a
    padded feature map in the same matmul (no separate crop)."""
    lo, hi = (0.0, float(src)) if window is None else (float(window[0]), float(window[1]))
    M = np.zeros((src, dst), np.float32)
    scale = (hi - lo) / dst
    for j in range(dst):
        x = lo + (j + 0.5) * scale - 0.5
        i0 = int(np.floor(x))
        f = x - i0
        i0c, i1c = np.clip(i0, 0, src - 1), np.clip(i0 + 1, 0, src - 1)
        M[i0c, j] += 1.0 - f
        M[i1c, j] += f
    return M


def upsample_bilinear_matmul(x: jax.Array, H: int, W: int) -> jax.Array:
    """(…, h, w) → (…, H, W) bilinear upsample as two matmul contractions."""
    h, w = x.shape[-2], x.shape[-1]
    mh = jnp.asarray(_interp_matrix(h, H)).astype(x.dtype)
    mw = jnp.asarray(_interp_matrix(w, W)).astype(x.dtype)
    x = jnp.einsum("...hw,hH->...Hw", x, mh, preferred_element_type=jnp.float32)
    x = jnp.einsum("...Hw,wW->...HW", x.astype(mh.dtype), mw,
                   preferred_element_type=jnp.float32)
    return x.astype(mh.dtype)


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
    crop: bool = True,
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
    # post-matmul chain (sigmoid → ×16-area upsample → crop → threshold) runs in
    # the model compute dtype: at bf16 the upsampled (B, N, H, W) tensor — the
    # largest intermediate in the predict path — carries half the HBM traffic,
    # and thresholding makes the boundary-pixel rounding moot.  fp32 models keep
    # the exact fp32 chain (golden parity path).
    cdtype = protos.dtype if protos.dtype == jnp.bfloat16 else jnp.float32
    masks = jax.nn.sigmoid(logits).astype(cdtype)
    if upsample and (Hp, Wp) != (H, W):
        masks = upsample_bilinear_matmul(masks, H, W)
        if crop:
            masks = crop_masks(masks, boxes.astype(cdtype))
    elif crop:
        scale = jnp.array([Wp / W, Hp / H, Wp / W, Hp / H], dtype=cdtype)
        masks = crop_masks(masks, boxes.astype(cdtype) * scale)
    if threshold is not None:
        masks = (masks > threshold).astype(cdtype)
    return masks


def paste_masks_to_original(
    masks: jax.Array,
    r: float,
    pad: Tuple[float, float],
    orig_hw: Tuple[int, int],
) -> jax.Array:
    """Undo the letterbox on decoded masks: crop padding, resize to original frame.

    masks: (B, N, H, W) at letterboxed (or proto) resolution; returns
    (B, N, h0, w0).  ``r`` is the mask-res/original-res scale and ``pad``
    (left, top) the padding offsets AT MASK RESOLUTION — both may be
    FRACTIONAL (the stride-4 proto path passes r/4 and pad/4; quantizing the
    pad to integer proto pixels shifted all retina masks by up to 2 original
    pixels when pad % 4 != 0).  One fused sample: output center (i+0.5) reads
    mask coordinate (i+0.5)·r + pad — bilinear, single resample
    (ultralytics scale_masks semantics without the int crop)."""
    B, N, H, W = masks.shape
    left, top = pad
    h0, w0 = orig_hw
    # output center o+0.5 samples input index p with (p+0.5)·scale+trans = o+0.5
    # ⇒ p+0.5 = ((o+0.5) - trans)/scale; want p+0.5 = (o+0.5)·r + pad
    # ⇒ scale = 1/r, trans = -pad/r
    return jax.image.scale_and_translate(
        masks,
        (B, N, h0, w0),
        (2, 3),
        jnp.asarray([1.0 / r, 1.0 / r], jnp.float32),
        jnp.asarray([-top / r, -left / r], jnp.float32),
        method="linear",
    )
