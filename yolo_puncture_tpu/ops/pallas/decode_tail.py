"""Pallas TPU kernel: fused tracker decode tail.

The decode tail — [up2× → dec8 3×3 conv → +f8p → up2× → dec4 3×3 conv → +f4p →
1×1 out] (track/network.py MaskDecoder.decode_tail; XMem-style mask decoder per
SURVEY.md §2.2 'DEVA inference core') — is the bench's worst profiled stage under
XLA: ~5% MXU, 38 ms/b64 at the 480×864 serving geometry (docs/bench_matrix_r3.md),
despite ≈1 ms of roofline HBM traffic.  This kernel computes the WHOLE tail for
one (frame, object) cell per grid step, entirely in VMEM:

  * both 3×3 convs run at LOW resolution in the subpixel-packed form
    (network._subpix_up_weights): 9 shifted (H·W, Cin) @ (Cin, 4·Cout) MXU
    matmuls per conv, fp32 accumulation;
  * BN affine + SiLU fused between matmuls;
  * the depth-to-space relayouts happen on VMEM-resident values;
  * the final 1×1 head contracts the 4·Cd parity channels with w_out, and the
    linear f4p skip contribution (object-free) is folded in OUTSIDE the kernel
    as a per-frame bias plane (same algebra as network.decode_tail_subpix).

The stride-4 per-object activations never touch HBM.  Numerics reference:
MaskDecoder.decode_tail (tests/test_pallas_kernels.py parity test).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_packed(x, w, h: int, wdt: int, cin: int, cout4: int):
    """x (h+2, w+2, cin) zero-padded input; w (3, 3, cin, cout4) →
    (h·wdt, cout4) fp32: 9 shifted matmuls on the MXU."""
    acc = jnp.zeros((h * wdt, cout4), jnp.float32)
    for di in range(3):
        for dj in range(3):
            tap = x[di : di + h, dj : dj + wdt, :].reshape(h * wdt, cin)
            acc = acc + jnp.dot(
                tap, w[di, dj], preferred_element_type=jnp.float32
            )
    return acc


def _d2s(y, h: int, w: int, c: int):
    """(h·w, 4·c) parity-grouped → (2h, 2w, c)."""
    y = y.reshape(h, w, 2, 2, c)
    return y.transpose(0, 2, 1, 3, 4).reshape(2 * h, 2 * w, c)


def _kernel(
    hidden_ref, f8p_ref, oskip_ref,
    w8_ref, a8_ref, w4_ref, a4_ref, wout_ref,
    out_ref,
    xp8_ref, y8p_ref, xp4_ref,
    *, h16: int, w16: int, cin: int, cd: int, dtype,
):
    h8, w8 = 2 * h16, 2 * w16
    # ---- dec8 (subpix at stride 16) ----
    xp8_ref[:] = jnp.zeros_like(xp8_ref)
    xp8_ref[1 : 1 + h16, 1 : 1 + w16, :] = hidden_ref[0, 0].astype(dtype)
    acc = _conv3x3_packed(xp8_ref[:], w8_ref[:], h16, w16, cin, 4 * cd)
    g = a8_ref[0]
    b = a8_ref[1]
    y = jax.nn.silu(acc * g + b).astype(dtype)          # (h16·w16, 4·cd)
    y8 = _d2s(y, h16, w16, cd) + f8p_ref[0].astype(dtype)  # (h8, w8, cd)

    # ---- dec4 (subpix at stride 8) ----
    xp4_ref[:] = jnp.zeros_like(xp4_ref)
    xp4_ref[1 : 1 + h8, 1 : 1 + w8, :] = y8
    acc4 = _conv3x3_packed(xp4_ref[:], w4_ref[:], h8, w8, cd, 4 * cd)
    y4 = jax.nn.silu(acc4 * a4_ref[0] + a4_ref[1])      # (h8·w8, 4·cd) fp32

    # ---- 1×1 out head per parity group + skip plane ----
    o = jnp.dot(
        y4.astype(dtype).reshape(h8 * w8 * 4, cd),
        wout_ref[:].reshape(cd, 1),
        preferred_element_type=jnp.float32,
    ).reshape(h8 * w8, 4)
    o = _d2s(o, h8, w8, 1)[..., 0]                      # (h4, w4)
    out_ref[0, 0] = o + oskip_ref[0]
    del y8p_ref  # scratch reserved for future strip processing


@functools.partial(
    jax.jit, static_argnames=("dtype", "interpret")
)
def decode_tail_pallas(variables, hidden, f8p, f4p, *, dtype=jnp.bfloat16,
                       interpret: bool = False):
    """Drop-in for network.decode_tail_subpix: hidden (N, No, H16, W16, Cin),
    f8p (N, H8, W8, Cd), f4p (N, H4, W4, Cd) → stride-4 logits (N, No, H4, W4)
    fp32."""
    from yolo_puncture_tpu.track.network import _subpix_up_weights

    p = variables["params"]["decoder"]
    bs = variables["batch_stats"]["decoder"]
    N, No, H16, W16, Cin = hidden.shape
    Cd = p["dec8"]["conv"]["kernel"].shape[-1]
    H8, W8 = 2 * H16, 2 * W16
    H4, W4 = 4 * H16, 4 * W16
    eps = 1e-3

    def bn_affine(name):
        g = p[name]["bn"]["scale"] / jnp.sqrt(bs[name]["bn"]["var"] + eps)
        b = p[name]["bn"]["bias"] - bs[name]["bn"]["mean"] * g
        # parity-packed channel order: 4 groups of Cd
        return jnp.stack([jnp.tile(g, 4), jnp.tile(b, 4)])

    w8 = _subpix_up_weights(p["dec8"]["conv"]["kernel"]).astype(dtype)
    w4 = _subpix_up_weights(p["dec4"]["conv"]["kernel"]).astype(dtype)
    a8 = bn_affine("dec8").astype(jnp.float32)
    a4 = bn_affine("dec4").astype(jnp.float32)
    w_out = p["out"]["kernel"][0, 0, :, 0].astype(dtype)
    # per-frame (object-free) skip plane: out(act + f4p) = out(act) + f4p·W_out
    oskip = (
        jnp.einsum("bhwc,c->bhw", f4p.astype(jnp.float32), w_out.astype(jnp.float32))
        + p["out"]["bias"][0]
    ).astype(jnp.float32)

    grid = (N * No,)
    kernel = functools.partial(
        _kernel, h16=H16, w16=W16, cin=Cin, cd=Cd, dtype=dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, H16, W16, Cin), lambda i: (i // No, i % No, 0, 0, 0)),
            pl.BlockSpec((1, H8, W8, Cd), lambda i: (i // No, 0, 0, 0)),
            pl.BlockSpec((1, H4, W4), lambda i: (i // No, 0, 0)),
            pl.BlockSpec((3, 3, Cin, 4 * Cd), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((2, 4 * Cd), lambda i: (0, 0)),
            pl.BlockSpec((3, 3, Cd, 4 * Cd), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((2, 4 * Cd), lambda i: (0, 0)),
            pl.BlockSpec((Cd,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, 1, H4, W4), lambda i: (i // No, i % No, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, No, H4, W4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H16 + 2, W16 + 2, Cin), dtype),
            pltpu.VMEM((8, 128), dtype),  # reserved
            pltpu.VMEM((H8 + 2, W8 + 2, Cd), dtype),
        ],
        interpret=interpret,
    )(hidden.astype(dtype), f8p.astype(dtype), oskip, w8, a8, w4, a4, w_out)
    return out
