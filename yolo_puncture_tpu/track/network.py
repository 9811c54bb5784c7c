"""Propagation network: key/value encoders, memory readout, mask decoder.

TPU-native re-design of the DEVA/XMem propagation model the reference drives
through ``DEVAInferenceCore`` (SURVEY.md §2.2 'DEVA inference core', §3.2 hot
inner ops: query-key affinity softmax over memory elements, top-k readout, value
decoding, multi-scale feature reuse).  Deliberate deviations for TPU:

  * Affinity is scaled dot-product (one MXU matmul) with top-k sparsification,
    not XMem's anisotropic L2 — same role, better MXU mapping.
  * All object dims are padded to a static ``max_objects``; inactive slots are
    masked, so every step is one fixed-shape XLA program (SURVEY.md hard part #1:
    dynamic object count → fixed max-objects padding).
  * Encoders are compact ConvBN/C2f stacks (nn/common.py) rather than ResNet50/18
    torch backbones.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolo_puncture_tpu.nn.common import C2f, ConvBN

Dtype = Any

KEY_DIM = 64
VALUE_DIM = 128
SENSORY_DIM = 64


def space_to_depth(x, r: int = 4):
    """(B, H, W, C) → (B, H/r, W/r, C·r²) — lane-friendly input stem.

    Small-channel convs at full resolution run at <5% MXU utilization (3→32
    channels pad to 128 lanes); folding 4×4 pixel blocks into channels moves the
    work to ≥48-channel tensors at 1/16 the spatial size."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // r, W // r, C * r * r)


class KeyEncoder(nn.Module):
    """Image → query key (stride 16) + multi-scale skip features f4/f8/f16.

    TPU layout: space-to-depth(4) stem, all convs ≥128 channels (MXU tiling)."""

    dtype: Dtype = jnp.float32
    stage3_n: int = 1

    def setup(self):
        # attribute names == the old inline name= strings → param paths (and
        # shipped checkpoints) are unchanged by the compact→setup refactor
        self.stem = ConvBN(128, 3, 1, dtype=self.dtype)
        self.stage1 = C2f(128, 1, True, dtype=self.dtype)
        self.down2 = ConvBN(256, 3, 2, dtype=self.dtype)
        self.stage2 = C2f(256, 1, True, dtype=self.dtype)
        self.down3 = ConvBN(256, 3, 2, dtype=self.dtype)
        self.stage3 = C2f(256, self.stage3_n, True, dtype=self.dtype)
        self.key_proj = ConvBN(KEY_DIM, 1, 1, act=False, dtype=self.dtype)

    def project_key(self, f16, train: bool = False):
        return self.key_proj(f16, train)

    def __call__(self, x, train: bool = False):
        y = space_to_depth(x, 4)                                               # /4, 48ch
        y = self.stem(y, train)
        f4 = self.stage1(y, train)                                             # /4
        y = self.down2(f4, train)                                              # /8
        f8 = self.stage2(y, train)
        y = self.down3(f8, train)                                              # /16
        f16 = self.stage3(y, train)
        key = self.key_proj(f16, train)
        return key, {"f4": f4, "f8": f8, "f16": f16}


def resize_bilinear_nhwc(x, H: int, W: int, src_window=None):
    """(…, h, w, C) → (…, H, W, C) bilinear resize as two matmul contractions
    (channel lanes stay minor — no gather, MXU-friendly).

    ``src_window=((rlo, rhi), (clo, chi))`` in FRACTIONS of the source extent
    samples only that region (crop + resize fused into the same matmuls)."""
    from yolo_puncture_tpu.ops.masks import _interp_matrix

    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (H, W) and src_window is None:
        return x
    rw = cw = None
    if src_window is not None:
        (rlo, rhi), (clo, chi) = src_window
        rw = (rlo * h, rhi * h)
        cw = (clo * w, chi * w)
    mh = jnp.asarray(_interp_matrix(h, H, rw)).astype(x.dtype)
    mw = jnp.asarray(_interp_matrix(w, W, cw)).astype(x.dtype)
    x = jnp.einsum("...hwc,hH->...Hwc", x, mh, preferred_element_type=jnp.float32)
    x = jnp.einsum(
        "...Hwc,wW->...HWc", x.astype(mh.dtype), mw, preferred_element_type=jnp.float32
    )
    return x.astype(mh.dtype)


class PyramidAdapter(nn.Module):
    """Detector pyramid {P3, P4, P5} → tracker features {f4, f8, f16} + key.

    TPU-native feature sharing: in the fused streaming pipeline the YOLO
    backbone already computes a P3/P4/P5 pyramid for every frame, so the
    tracker's own key encoder (the second-largest compute stage) is replaced by
    1×1 projections + matmul-bilinear resizes of those features onto the
    tracker's geometry.  The reference runs DEVA's separate ResNet encoder per
    frame (SURVEY.md §3.2); sharing the backbone is a deliberate TPU-first
    redesign (documented in PARITY.md deviations).

    Channels follow the v10s defaults (P3 128, P4 256, P5 512); any detector
    scale works — the projections read whatever arrives.
    """

    dtype: Dtype = jnp.float32

    def setup(self):
        self.proj4 = ConvBN(128, 1, 1, dtype=self.dtype)
        self.proj8 = ConvBN(256, 1, 1, dtype=self.dtype)
        self.proj16a = ConvBN(128, 1, 1, dtype=self.dtype)   # from P4
        self.proj16b = ConvBN(128, 1, 1, dtype=self.dtype)   # from P5 (context)
        self.fuse16 = ConvBN(256, 3, 1, dtype=self.dtype)

    def __call__(self, p3, p4, p5, out_hw, train: bool = False, content_box=None):
        """p3 (B, H8, W8, C3), p4 (B, H16, W16, C4), p5 (B, H32, W32, C5);
        out_hw = (h16, w16) tracker stride-16 grid → skips dict (B, …).

        ``content_box=((rlo, rhi), (clo, chi))``, fractions of the pyramid
        extent, samples only the letterbox CONTENT region — so a tracker grid
        with the reference's min-side-480 aspect (e.g. 480×864 for 720p input)
        reads undistorted content instead of the pad bands (the crop fuses
        into the resize matmuls)."""
        h16, w16 = out_hw
        f4 = resize_bilinear_nhwc(self.proj4(p3, train), 4 * h16, 4 * w16, content_box)
        f8 = resize_bilinear_nhwc(self.proj8(p4, train), 2 * h16, 2 * w16, content_box)
        a = resize_bilinear_nhwc(self.proj16a(p4, train), h16, w16, content_box)
        b = resize_bilinear_nhwc(self.proj16b(p5, train), h16, w16, content_box)
        f16 = self.fuse16(jnp.concatenate([a, b], axis=-1), train)
        return {"f4": f4, "f8": f8, "f16": f16}


class ValueEncoder(nn.Module):
    """(image features f16, object mask) → memory value (stride 16), per object."""

    dtype: Dtype = jnp.float32
    value_dim: int = VALUE_DIM

    @nn.compact
    def __call__(self, f16, mask_s16, sensory, train: bool = False):
        # mask_s16: (No, H16, W16, 1); f16: (H16, W16, C) broadcast over objects
        No = mask_s16.shape[0]
        f = jnp.broadcast_to(f16[None], (No, *f16.shape))
        x = jnp.concatenate([f, mask_s16, sensory], axis=-1)
        y = ConvBN(256, 3, 1, dtype=self.dtype, name="fuse1")(x, train)
        y = C2f(256, 1, True, dtype=self.dtype, name="block")(y, train)
        return ConvBN(
            self.value_dim, 1, 1, act=False, dtype=self.dtype, name="value_proj"
        )(y, train)


class SensoryUpdater(nn.Module):
    """GRU-style per-object sensory memory at stride 16 (XMem hidden-state analog).
    Both gates come from one fused conv (one MXU pass instead of two)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, feat, train: bool = False):
        x = jnp.concatenate([hidden, feat], axis=-1)
        gates = ConvBN(
            2 * SENSORY_DIM, 3, 1, act=False, dtype=self.dtype, name="gates"
        )(x, train)
        z = jax.nn.sigmoid(gates[..., :SENSORY_DIM])
        r = jax.nn.sigmoid(gates[..., SENSORY_DIM:])
        cand = jnp.tanh(
            ConvBN(SENSORY_DIM, 3, 1, act=False, dtype=self.dtype, name="cand")(
                jnp.concatenate([r * hidden, feat], axis=-1), train
            )
        )
        return (1 - z) * hidden + z * cand


class MaskDecoder(nn.Module):
    """(readout value, skips, sensory) → per-object mask logit at full stride-4 then
    upsampled ×4; soft-aggregated outside."""

    dtype: Dtype = jnp.float32
    in_dim: int = 128
    dec_dim: int = 64

    def setup(self):
        # declared in setup (not inline) so head/project_skips/decode_tail can
        # be applied from separate scan stages; attribute names keep the param
        # paths identical to the original inline name= modules
        self.skip8 = ConvBN(self.dec_dim, 1, 1, dtype=self.dtype)
        self.skip4 = ConvBN(self.dec_dim, 1, 1, dtype=self.dtype)
        self.in_conv = ConvBN(self.in_dim, 3, 1, dtype=self.dtype)
        self.dec8 = ConvBN(self.dec_dim, 3, 1, dtype=self.dtype)
        self.dec4 = ConvBN(self.dec_dim, 3, 1, dtype=self.dtype)
        self.out = nn.Conv(1, (1, 1), dtype=self.dtype)
        # stride-16 mask head on the hidden state: the memory WRITE consumes a
        # stride-16 mask (the old path downsampled the stride-4 decode to get
        # it), so predicting it here lets the expensive dec8/dec4 tail run
        # OUTSIDE the sequential propagation scan (XMem deep-update analog)
        self.out16 = nn.Conv(1, (1, 1), dtype=self.dtype)

    def head(self, readout, sensory, train: bool = False):
        """(readout, sensory) → (hidden_feat, logits_s16) — the memory-coupled
        part of the decoder (runs inside propagation scans)."""
        x = jnp.concatenate([readout, sensory], axis=-1)
        hidden_feat = self.in_conv(x, train)
        logits_s16 = self.out16(hidden_feat)[..., 0]
        return hidden_feat, logits_s16

    def project_skips(self, skips, train: bool = False):
        """Batched 1×1 skip projections (memory-independent — hoist out of scans)."""
        return {
            "f8p": self.skip8(skips["f8"], train),
            "f4p": self.skip4(skips["f4"], train),
        }

    def decode_tail(self, hidden_feat, f8p, f4p, train: bool = False):
        """hidden_feat (…, No, H16, W16, C) + projected skips → stride-4 logits.

        Memory-independent given hidden_feat — callers batch it over all frames
        outside the scan.  Leading batch dims beyond No are folded by vmap at
        the call site; this method handles one frame: (No, H16, W16, C)."""
        No = hidden_feat.shape[0]

        def up(x):
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

        x = self.dec8(up(hidden_feat), train)
        x = x + jnp.broadcast_to(f8p[None], (No, *f8p.shape))
        x = self.dec4(up(x), train)
        x = x + jnp.broadcast_to(f4p[None], (No, *f4p.shape))
        return self.out(x)[..., 0]  # (No, H4, W4)

    def __call__(self, readout, skips, sensory, train: bool = False, full_res: bool = True):
        # readout: (No, H16, W16, Cv); skips f8 (H8, W8, C), f4 — or, when keys
        # "f8p"/"f4p" are present, skip features ALREADY projected by
        # project_skips.  full_res=False returns stride-4 logits (callers batch
        # the ×4 upsample outside a scan).
        hidden_feat, logits_s16 = self.head(readout, sensory, train)
        f8p = skips["f8p"] if "f8p" in skips else self.skip8(skips["f8"], train)
        f4p = skips["f4p"] if "f4p" in skips else self.skip4(skips["f4"], train)
        logits_s4 = self.decode_tail(hidden_feat, f8p, f4p, train)
        if not full_res:
            return logits_s4, hidden_feat, logits_s16
        from yolo_puncture_tpu.ops.masks import upsample_bilinear_matmul

        logits = upsample_bilinear_matmul(
            logits_s4, logits_s4.shape[1] * 4, logits_s4.shape[2] * 4
        )
        return logits, hidden_feat, logits_s16


class PropagationNetwork(nn.Module):
    """Bundles the submodules; apply with method= to reach each piece.

    Channel dims are tuned for throughput on the puncture workload (≤4 thin
    objects): value_dim 128 and a 128/64 decoder cut the per-frame readout
    value matmul and the stride-4/8 decode convs ~4× vs the first-cut 256/128
    design with no measurable propagation-IoU loss after retraining
    (apps/train_tracker.py; tests/test_track.py::test_windowed_propagation_quality).
    """

    dtype: Dtype = jnp.float32
    value_dim: int = VALUE_DIM
    in_dim: int = 128
    dec_dim: int = 64
    stage3_n: int = 1
    with_pyramid_adapter: bool = False
    # dummy pyramid channels used only by the init path (any detector scale
    # works at apply time — the 1×1 projections read whatever arrives)
    pyramid_channels: Tuple[int, int, int] = (128, 256, 512)

    def setup(self):
        self.key_encoder = KeyEncoder(dtype=self.dtype, stage3_n=self.stage3_n)
        self.value_encoder = ValueEncoder(dtype=self.dtype, value_dim=self.value_dim)
        self.sensory = SensoryUpdater(dtype=self.dtype)
        self.decoder = MaskDecoder(dtype=self.dtype, in_dim=self.in_dim, dec_dim=self.dec_dim)
        if self.with_pyramid_adapter:
            self.pyr_adapter = PyramidAdapter(dtype=self.dtype)

    def encode_key(self, image, train: bool = False):
        return self.key_encoder(image, train)

    def encode_from_pyramid(
        self, p3, p4, p5, out_hw, train: bool = False, content_box=None
    ):
        """Detector pyramid → (key (B, h16, w16, Ck), skips) — the shared-backbone
        replacement for encode_key (PyramidAdapter docstring)."""
        skips = self.pyr_adapter(p3, p4, p5, out_hw, train, content_box)
        key = self.key_encoder.project_key(skips["f16"], train)
        return key, skips

    def encode_value(self, f16, mask_s16, sensory, train: bool = False):
        return self.value_encoder(f16, mask_s16, sensory, train)

    def update_sensory(self, hidden, feat, train: bool = False):
        return self.sensory(hidden, feat, train)

    def decode(self, readout, skips, sensory, train: bool = False, full_res: bool = True):
        return self.decoder(readout, skips, sensory, train, full_res)

    def project_skips(self, skips, train: bool = False):
        return self.decoder.project_skips(skips, train)

    def decode_head(self, readout, sensory, train: bool = False):
        return self.decoder.head(readout, sensory, train)

    def decode_tail(self, hidden_feat, f8p, f4p, train: bool = False):
        return self.decoder.decode_tail(hidden_feat, f8p, f4p, train)

    def __call__(self, image):
        # init-only path: build all params with dummy shapes
        key, skips = self.encode_key(image)
        H16, W16 = key.shape[1:3]
        if self.with_pyramid_adapter:
            B, h, w = image.shape[0], image.shape[1], image.shape[2]
            c3, c4, c5 = self.pyramid_channels
            self.encode_from_pyramid(
                jnp.zeros((B, h // 8, w // 8, c3), self.dtype),
                jnp.zeros((B, h // 16, w // 16, c4), self.dtype),
                jnp.zeros((B, h // 32, w // 32, c5), self.dtype),
                (H16, W16),
            )
        No = 2
        mask_s16 = jnp.zeros((No, H16, W16, 1), self.dtype)
        sens = jnp.zeros((No, H16, W16, SENSORY_DIM), self.dtype)
        value = self.encode_value(skips["f16"][0], mask_s16, sens)
        readout = jnp.zeros((No, H16, W16, self.value_dim), self.dtype)
        logits, hidden_feat, logits_s16 = self.decode(
            readout, {k: v[0] for k, v in skips.items()}, sens
        )
        new_sens = self.update_sensory(sens, hidden_feat)
        return logits


def memory_readout(
    query_key,      # (H16*W16, Ck)
    mem_keys,       # (T*H16*W16, Ck)
    mem_values,     # (No, T*H16*W16, Cv)
    mem_valid,      # (T*H16*W16,) bool
    top_k: int = 30,
):
    """Affinity softmax + top-k readout — the SURVEY §3.2 hot op (XLA reference).

    Scaled dot-product affinity (one MXU matmul), top-k sparsification per query,
    softmax over the kept entries, then value gather-matmul per object.
    NOTE: lax.top_k + gather is slow on TPU (sort + scatter); production paths use
    ``memory_readout_dense`` / the Pallas flash variant — this stays as the
    XMem-faithful numerics reference.
    """
    Ck = query_key.shape[-1]
    scale = Ck ** -0.5
    aff = (query_key @ mem_keys.T) * scale                        # (Q, M)
    aff = jnp.where(mem_valid[None, :], aff, -1e9)
    k = min(top_k, aff.shape[-1])
    topv, topi = jax.lax.top_k(aff, k)                            # (Q, k)
    w = jax.nn.softmax(topv, axis=-1)                             # (Q, k)
    # gather values at topi: (No, Q, k, Cv) — contract over k
    gathered = mem_values[:, topi]                                # (No, Q, k, Cv)
    return jnp.einsum("qk,nqkc->nqc", w, gathered)                # (No, Q, Cv)


def memory_readout_dense(query_key, mem_keys, mem_values, mem_valid, return_usage=False,
                         affinity_bf16: bool = False):
    """Dense full-softmax readout: two MXU matmuls, no sort/gather.

    TPU-native replacement for the top-k path: affinity (Q, M) → masked softmax →
    (Q, M) @ (No, M, Cv).  XLA fuses mask+softmax into the matmul epilogue; HBM
    traffic is the (Q, M) weight matrix twice — bandwidth-bound but ~100× faster
    than sort+gather at memory sizes used here.  The Pallas flash variant
    (ops/pallas/mem_attention.py) streams it without materializing (Q, M).

    ``return_usage=False`` skips the per-element attention-mass einsum (one
    full pass over the (Q, M) weights) — callers without the long-term
    consolidation tier should pass False.

    ``affinity_bf16=True`` materializes the (Q, M) affinity in bf16 instead
    of fp32 — half the HBM traffic of the readout's largest intermediate.
    Softmax max/sum statistics stay fp32.  Precision headroom is proven by
    the int8 path (s8 affinity, ≤1e-4 propagation IoU delta)."""
    Ck = query_key.shape[-1]
    scale = Ck ** -0.5
    aff_dtype = jnp.bfloat16 if affinity_bf16 else jnp.float32
    aff = jnp.einsum(
        "qc,mc->qm", query_key, mem_keys, preferred_element_type=aff_dtype
    ) * jnp.asarray(scale, aff_dtype)
    valid = mem_valid[None, :]
    neg = jnp.asarray(-jnp.inf, aff_dtype)
    aff = jnp.where(valid, aff, neg)
    m = jnp.max(aff, axis=-1, keepdims=True).astype(jnp.float32)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # all-invalid rows → zero readout
    # unnormalized weights in the value dtype; the softmax denominator divides
    # the (No, Q, Cv) readout AFTER the matmul — one fewer pass over the (Q, M)
    # tensor, which is the largest intermediate of the whole tracker step
    p = (jnp.exp(aff.astype(jnp.float32) - m) * valid).astype(mem_values.dtype)
    if not return_usage:
        # fold the softmax denominator into the value matmul (ones column on
        # object slot 0): one fewer full pass over the (Q, M) weights
        No, M, Cv = mem_values.shape
        ones_col = jnp.ones((1, M, 1), mem_values.dtype)
        vals_aug = jnp.concatenate(
            [mem_values, jnp.broadcast_to(ones_col, (No, M, 1))], axis=-1
        )
        out_aug = jnp.einsum(
            "qm,nmc->nqc", p, vals_aug, preferred_element_type=jnp.float32
        )
        l = jnp.maximum(out_aug[0, :, -1:], 1e-9)  # (Q, 1)
        return (out_aug[..., :-1] / l[None]).astype(mem_values.dtype)
    l = jnp.maximum(jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True), 1e-9)
    out = jnp.einsum(
        "qm,nmc->nqc", p, mem_values, preferred_element_type=jnp.float32
    )
    out = (out / l[None]).astype(mem_values.dtype)
    if return_usage:
        # per-memory-element attention mass (long-term consolidation signal)
        usage = jnp.einsum(
            "qm,qo->m", p.astype(jnp.float32), (1.0 / l)
        )
        return out, usage
    return out


def memory_readout_dense_int8(
    query_key,     # (Q, Ck) fp — quantized in-graph per call
    keys_i8,       # (T, HW, Ck) int8 ring (quantized at write time)
    k_scale,       # (T,) fp32 per-slot key scales
    values_i8,     # (No, T, HW, Cv) int8 ring
    v_scale,       # (No, T) fp32 per-object-per-slot value scales
    slot_valid,    # (T,) bool
    out_dtype=jnp.float32,
    return_usage: bool = False,
):
    """Dense readout with an INT8 memory bank: both MXU matmuls run
    s8×s8→s32 (2× bf16 MXU throughput on v5e, half the HBM traffic for the
    ring).  Validated: full-int8 simulation stays within 1e-4 propagation IoU
    of fp on the shipped checkpoint (per-tensor query, per-slot key, per-row
    softmax weight, per-(object, slot) value scales).

    Per-slot value scales would break a single flat matmul (scale varies
    along the contracted axis), so the value contraction batches over T —
    identical FLOPs, and the per-slot scale applies to the (No, T, Q, Cv)
    partials before the T-sum.  Long-term prototypes are NOT supported here
    (TrackerCore enforces enable_long_term=False with quantized memory)."""
    T, HW, Ck = keys_i8.shape
    No, _, _, Cv = values_i8.shape
    Q = query_key.shape[0]
    scale = Ck ** -0.5

    qf = query_key.astype(jnp.float32)
    sq = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-8) / 127.0
    qi8 = jnp.clip(jnp.round(qf / sq), -127, 127).astype(jnp.int8)

    aff = jnp.einsum(
        "qc,thc->qth", qi8, keys_i8, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    aff = aff * (sq * scale) * k_scale[None, :, None]        # dequant per slot
    valid = slot_valid[None, :, None]
    aff = jnp.where(valid, aff, -jnp.inf)
    m = jnp.max(aff, axis=(1, 2), keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(aff - m) * valid                             # (Q, T, HW) fp32
    # int8 softmax weights, per-row scale (p ∈ (0, 1], so sp = rowmax/127)
    sp = jnp.maximum(jnp.max(p, axis=(1, 2), keepdims=True), 1e-9) / 127.0
    pi8 = jnp.clip(jnp.round(p / sp), 0, 127).astype(jnp.int8)
    pq = pi8.astype(jnp.float32) * sp                        # dequantized weights
    l = jnp.maximum(jnp.sum(pq, axis=(1, 2)), 1e-9)          # (Q,)

    out = jnp.einsum(
        "qth,nthc->ntqc", pi8, values_i8, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    out = jnp.einsum("ntqc,nt->nqc", out, v_scale)           # per-slot dequant + T-sum
    out = out * (sp.reshape(1, Q, 1) / l[None, :, None])
    out = out.astype(out_dtype)
    if return_usage:
        usage = jnp.einsum("qth,q->th", pq, 1.0 / l)         # (T, HW)
        return out, usage
    return out


def _subpix_up_weights(K):
    """3×3 kernel (3, 3, Cin, Cout) → (3, 3, Cin, 4·Cout): the one-conv form of
    [nearest-neighbor 2× upsample → 3×3 stride-1 conv, pad 1].

    Output parity (di, dj) of the upsampled conv only ever sees a 2×2
    neighborhood of the LOW-res input (each 3×3 tap lands on a repeated pixel),
    so each parity collapses to a 2×2 effective kernel with summed taps; the
    four parities pack into one 3×3-support conv at LOW resolution producing
    4·Cout channels, un-packed by depth-to-space.  Exact (up to fp add order).
    Derivation: output row 2i+di reads up-rows 2i+di+u−1, u∈{0,1,2}; with
    up-row p ≡ low-row p//2, di=0 hits {i−1, i, i} and di=1 hits {i, i, i+1}."""
    row0 = jnp.stack([K[0], K[1] + K[2]])                    # di=0 → rows {-1, 0}
    row1 = jnp.stack([K[0] + K[1], K[2]])                    # di=1 → rows {0, +1}

    def cols(r):
        c0 = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)  # dj=0 → cols {-1, 0}
        c1 = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)  # dj=1 → cols {0, +1}
        return c0, c1

    Cin, Cout = K.shape[2], K.shape[3]
    W = jnp.zeros((3, 3, Cin, 4 * Cout), K.dtype)
    for di, (c0, c1) in enumerate([cols(row0), cols(row1)]):
        for dj, W2 in enumerate([c0, c1]):
            r0, cc0 = di, dj                      # di=0 kernels sit on support rows {0,1}
            g = (di * 2 + dj) * Cout
            W = W.at[r0 : r0 + 2, cc0 : cc0 + 2, :, g : g + Cout].set(W2)
    return W


def _depth_to_space2(y, Cout: int):
    """(..., H, W, 4·Cout) parity-grouped → (..., 2H, 2W, Cout)."""
    *lead, H, W, _ = y.shape
    y = y.reshape(*lead, H, W, 2, 2, Cout)
    perm = list(range(len(lead))) + [len(lead), len(lead) + 2, len(lead) + 1,
                                     len(lead) + 3, len(lead) + 4]
    return y.transpose(*perm).reshape(*lead, 2 * H, 2 * W, Cout)


def decode_tail_subpix(variables, hidden, f8p, f4p, *, dtype=jnp.bfloat16):
    """Fused low-resolution decode tail: hidden (N, No, H16, W16, Cin) + projected
    skips f8p (N, H8, W8, C), f4p (N, H4, W4, C) → stride-4 logits (N, No, H4, W4).

    Mathematically equivalent (up to fp reassociation) to MaskDecoder.decode_tail
    — [up2× → dec8 → +f8p → up2× → dec4 → +f4p → out1×1] — but every conv runs at
    the LOW resolution via subpixel weight packing (_subpix_up_weights), and the
    final 1×1 'out' head is applied per parity group at stride 8, with the linear
    f4p contribution folded in as a per-frame (object-free) 1×1:
       out(act + f4p) = out(act) + f4p · W_out  (bias counted once).
    The stride-4 64-channel per-object tensor — the old tail's dominant HBM
    traffic — is never materialized.  Used by the batched propagation paths;
    ``MaskDecoder.decode_tail`` remains the numerics reference
    (tests/test_track.py::test_subpix_tail_matches_exact)."""
    p = variables["params"]["decoder"]
    bs = variables["batch_stats"]["decoder"]
    N, No, H16, W16, Cin = hidden.shape
    eps = 1e-3

    def bn_affine(name):
        g = p[name]["bn"]["scale"] / jnp.sqrt(bs[name]["bn"]["var"] + eps)
        b = p[name]["bn"]["bias"] - bs[name]["bn"]["mean"] * g
        return g, b

    def stage(x, name, Cout):
        """x (B, H, W, Cin) → parity-grouped conv + BN + SiLU → (B, H, W, 4, Cout).

        Conv output, BN affine, and SiLU all stay in ``dtype`` (the MXU still
        accumulates fp32 internally): an fp32 intermediate here materializes
        ~1.7 GB per 64-frame batch at the dec4 stage alone — the tail is
        bandwidth-bound, not FLOP-bound, at these shapes."""
        W = _subpix_up_weights(p[name]["conv"]["kernel"]).astype(dtype)
        y = jax.lax.conv_general_dilated(
            x, W, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype,
        )
        g, b = bn_affine(name)
        y = y.reshape(*y.shape[:-1], 4, Cout) * g.astype(dtype) + b.astype(dtype)
        return jax.nn.silu(y)

    Cd = p["dec8"]["conv"]["kernel"].shape[-1]
    h = hidden.reshape(N * No, H16, W16, Cin).astype(dtype)
    y = stage(h, "dec8", Cd)                                   # (N·No, H16, W16, 4, Cd)
    y = _depth_to_space2(y.reshape(N * No, H16, W16, 4 * Cd), Cd)
    y = y.reshape(N, No, 2 * H16, 2 * W16, Cd) + f8p[:, None].astype(dtype)

    y = stage(y.reshape(N * No, 2 * H16, 2 * W16, Cd), "dec4", Cd)
    w_out = p["out"]["kernel"][0, 0, :, 0].astype(dtype)       # (Cd,)
    o = jnp.einsum("bhwgc,c->bhwg", y, w_out)                  # per-parity 1×1 head
    o = _depth_to_space2(o[..., None].reshape(N * No, 2 * H16, 2 * W16, 4), 1)
    o = o.reshape(N, No, 4 * H16, 4 * W16)
    o_skip = (
        jnp.einsum("bhwc,c->bhw", f4p.astype(dtype), w_out) + p["out"]["bias"][0]
    )
    return (o.astype(jnp.float32) + o_skip[:, None].astype(jnp.float32))


def soft_aggregate(logits, active, eps: float = 1e-7):
    """Per-object sigmoid logits (No, H, W) → normalized probs (No+1, H, W) with
    background = Π(1−pᵢ) (standard VOS soft aggregation)."""
    p = jax.nn.sigmoid(logits) * active[:, None, None]
    bg = jnp.clip(jnp.prod(1.0 - p, axis=0, keepdims=True), eps, 1.0)
    logit_stack = jnp.concatenate([jnp.log(bg / (1 - bg + eps) + eps),
                                   jnp.log(p / (1 - p + eps) + eps)], axis=0)
    return jax.nn.softmax(logit_stack, axis=0)
