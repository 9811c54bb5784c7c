"""Pallas TPU kernel: fused proto-mask decode.

One pass over the prototype bank computes, per pixel tile:
  logits = coeffs @ protosᵀ  (MXU)  →  sigmoid  →  box-crop mask  →  threshold
so the (N, nm) × (nm, H·W) contraction, activation, crop and binarization never
round-trip through HBM between stages (the reference's seg-head decode contract,
SURVEY.md §2.2 'YOLO segmentation head'; BASELINE north star names this fusion).

Used at proto resolution (Hp·Wp); the XLA path in ops/masks.py remains the
reference implementation and the upsampled (retina) path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(coeffs_ref, protos_ref, boxes_ref, out_ref, *, wp: int, threshold: float):
    # blocks: coeffs (N, nm) | protos (TILE_PX, nm) | boxes (N, 4) | out (N, TILE_PX)
    j = pl.program_id(0)
    tile_px = protos_ref.shape[0]
    logits = jnp.dot(
        coeffs_ref[:], protos_ref[:].T, preferred_element_type=jnp.float32
    )  # (N, TILE_PX)
    masks = jax.nn.sigmoid(logits)

    # pixel coordinates of this tile (row-major over Hp×Wp)
    base = j * tile_px
    flat = base + jax.lax.broadcasted_iota(jnp.int32, (1, tile_px), 1)
    px = (flat % wp).astype(jnp.float32)       # x
    py = (flat // wp).astype(jnp.float32)      # y

    x1 = boxes_ref[:, 0:1]
    y1 = boxes_ref[:, 1:2]
    x2 = boxes_ref[:, 2:3]
    y2 = boxes_ref[:, 3:4]
    inside = (px >= x1) & (px < x2) & (py >= y1) & (py < y2)
    masks = jnp.where(inside, masks, 0.0)
    if threshold is not None:
        masks = (masks > threshold).astype(jnp.float32)
    out_ref[:] = masks


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def proto_decode_pallas(protos, coeffs, boxes, threshold: float = 0.5, interpret: bool = False):
    """protos (Hp, Wp, nm); coeffs (N, nm); boxes (N, 4) xyxy in proto-pixel coords.
    Returns (N, Hp, Wp) float {0,1} (or [0,1] when threshold=None)."""
    Hp, Wp, nm = protos.shape
    N = coeffs.shape[0]
    PX = Hp * Wp
    # largest power-of-two tile ≤512 dividing the pixel count (640² serving
    # geometry → 160×160 proto → TILE 512; tiny test geometries still work)
    TILE_PX = min(512, PX)
    while PX % TILE_PX:
        TILE_PX //= 2
    assert TILE_PX >= 1
    protos_flat = protos.reshape(PX, nm)

    out = pl.pallas_call(
        functools.partial(_kernel, wp=Wp, threshold=threshold),
        grid=(PX // TILE_PX,),
        in_specs=[
            pl.BlockSpec((N, nm), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_PX, nm), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 4), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, TILE_PX), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, PX), jnp.float32),
        interpret=interpret,
    )(
        coeffs.astype(jnp.float32),
        protos_flat.astype(jnp.float32),
        boxes.astype(jnp.float32),
    )
    return out.reshape(N, Hp, Wp)
