"""Segment Anything (SAM): ViT encoder + prompt encoder + mask decoder + AMG.

Reference usage contract (yolo_seg/utils/segment_anything.py:73-89, SURVEY.md §2.2
'SAM automatic mask generator'): ``sam_model_registry[vit_h|vit_l|vit_b](ckpt)``;
``SamAutomaticMaskGenerator(sam, crop_n_layers=1,
crop_n_points_downscale_factor=2).generate(image)`` → list of dicts with
``segmentation`` (bool HW), ``bbox`` (xywh), ``area``, ``crop_box``; consumed by
the needle-heuristic ranking (ops/geometry.filter_masks).

The module structure mirrors the released SAM checkpoints exactly — decomposed
relative-position attention in every encoder block, the two-way transformer with
downsampled cross-attention, per-token hypernetwork MLPs — so real ``sam_vit_*.pth``
state dicts convert losslessly (utils/torch_convert.convert_sam_state_dict;
parity-tested against an independent torch implementation in
tests/test_sam_parity.py).

TPU notes: NHWC throughout; windowed attention batches the 14×14 windows into
one big batched matmul; prompt batches run through the two-way decoder as one
batched program.  Offline annotation tool (SURVEY §7.9) — throughput matters
less than the predict path, so no bespoke kernels here.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from yolo_puncture_tpu.registry import register_model

Dtype = Any

# variant: (embed_dim, depth, num_heads, global_attn_indexes)
_VIT_CFG = {
    "vit_b": (768, 12, 12, (2, 5, 8, 11)),
    "vit_l": (1024, 24, 16, (5, 11, 17, 23)),
    "vit_h": (1280, 32, 16, (7, 15, 23, 31)),
}

PATCH = 16
PROMPT_DIM = 256


class _Attention(nn.Module):
    """Encoder attention (qkv fused) with optional decomposed rel-pos
    (segment-anything image_encoder.Attention, use_rel_pos=True in all released
    checkpoints)."""

    dim: int
    num_heads: int
    use_rel_pos: bool = False
    input_size: Optional[Tuple[int, int]] = None  # (H, W) of the token grid
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, C) with N == H*W of input_size when rel_pos
        B, N, C = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, self.num_heads, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # (B, N, h, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * hd ** -0.5
        if self.use_rel_pos:
            H, W = self.input_size
            # decomposed rel-pos (q_size == k_size here): Rh[i,j] = rel_pos_h[i-j+H-1]
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * H - 1, hd)
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * W - 1, hd)
            )
            idx_h = jnp.arange(H)[:, None] - jnp.arange(H)[None, :] + (H - 1)
            idx_w = jnp.arange(W)[:, None] - jnp.arange(W)[None, :] + (W - 1)
            Rh = rel_h[idx_h].astype(q.dtype)  # (H, H, hd)
            Rw = rel_w[idx_w].astype(q.dtype)  # (W, W, hd)
            r_q = q.reshape(B, H, W, self.num_heads, hd)
            bias_h = jnp.einsum("bhwnd,hkd->bnhwk", r_q, Rh)  # (B, nh, H, W, H)
            bias_w = jnp.einsum("bhwnd,wkd->bnhwk", r_q, Rw)  # (B, nh, H, W, W)
            attn = attn.reshape(B, self.num_heads, H, W, H, W)
            attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
            attn = attn.reshape(B, self.num_heads, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class _Block(nn.Module):
    dim: int
    num_heads: int
    window: int  # 0 = global (token grid derived from the input tensor)
    use_rel_pos: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window > 0:
            w = self.window
            ph = (w - H % w) % w
            pw = (w - W % w) % w
            xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            Hp, Wp = H + ph, W + pw
            xw = xp.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5)
            xw = xw.reshape(-1, w * w, C)
            xw = _Attention(
                self.dim, self.num_heads, self.use_rel_pos, (w, w),
                self.dtype, name="attn",
            )(xw)
            xw = xw.reshape(B, Hp // w, Wp // w, w, w, C).transpose(0, 1, 3, 2, 4, 5)
            x = xw.reshape(B, Hp, Wp, C)[:, :H, :W]
        else:
            xs = x.reshape(B, H * W, C)
            xs = _Attention(
                self.dim, self.num_heads, self.use_rel_pos, (H, W),
                self.dtype, name="attn",
            )(xs)
            x = xs.reshape(B, H, W, C)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.dim * 4, dtype=self.dtype, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    variant: str = "vit_b"
    img_size: int = 1024
    window: int = 14
    use_rel_pos: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, img_size, img_size, 3) normalized
        dim, depth, heads, global_idx = _VIT_CFG[self.variant]
        grid = self.img_size // PATCH
        x = nn.Conv(
            dim, (PATCH, PATCH), strides=(PATCH, PATCH), padding="VALID",
            dtype=self.dtype, name="patch_embed_proj",
        )(x)  # (B, grid, grid, dim)
        Hp, Wp = x.shape[1:3]
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, grid, grid, dim)
        )
        x = x + pos[:, :Hp, :Wp]
        for i in range(depth):
            x = _Block(
                dim, heads, window=0 if i in global_idx else self.window,
                use_rel_pos=self.use_rel_pos,
                dtype=self.dtype, name=f"block_{i}",
            )(x)
        # neck: 1x1 → 3x3 with channel LayerNorm (LayerNorm2d, eps 1e-6)
        x = nn.Conv(PROMPT_DIM, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(
            PROMPT_DIM, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="neck_conv2",
        )(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="neck_ln2")(x)


# ---------------------------------------------------------------------------
# Prompt encoder (real SAM structure: pe_layer + point/mask embeddings)
# ---------------------------------------------------------------------------


class _Embed(nn.Module):
    """nn.Embedding(1, dim) analog — one learned vector, torch leaf 'weight'."""

    dim: int = PROMPT_DIM

    @nn.compact
    def __call__(self):
        return self.param("weight", nn.initializers.normal(1.0), (1, self.dim))


class _PELayer(nn.Module):
    """PositionEmbeddingRandom: random-Fourier encoding of [0,1]² coords."""

    num_pos_feats: int = PROMPT_DIM // 2

    @nn.compact
    def __call__(self, coords_01):
        g = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(1.0), (2, self.num_pos_feats),
        )
        x = (2 * coords_01 - 1) @ g
        x = 2 * jnp.pi * x
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], -1)


class PromptEncoder(nn.Module):
    """Points (+ optional dense mask) prompt embedding, real key layout."""

    dtype: Dtype = jnp.float32

    def setup(self):
        self.pe_layer = _PELayer(name="pe_layer")
        self.point_embeddings_0 = _Embed(name="point_embeddings_0")  # negative
        self.point_embeddings_1 = _Embed(name="point_embeddings_1")  # positive
        self.point_embeddings_2 = _Embed(name="point_embeddings_2")  # box tl
        self.point_embeddings_3 = _Embed(name="point_embeddings_3")  # box br
        self.not_a_point_embed = _Embed(name="not_a_point_embed")
        self.no_mask_embed = _Embed(name="no_mask_embed")
        # mask_downscaling (mask-prompt path; present so real checkpoints
        # convert with full coverage): 2× stride-2 convs + channel LNs + 1×1
        self.md_conv1 = nn.Conv(4, (2, 2), strides=(2, 2), dtype=self.dtype,
                                name="md_conv1")
        self.md_ln1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="md_ln1")
        self.md_conv2 = nn.Conv(16, (2, 2), strides=(2, 2), dtype=self.dtype,
                                name="md_conv2")
        self.md_ln2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="md_ln2")
        self.md_conv3 = nn.Conv(PROMPT_DIM, (1, 1), dtype=self.dtype,
                                name="md_conv3")

    def embed_points(self, points_01, labels):
        """points_01 (B, P, 2) in [0,1] (pixel centers); labels 1=fg 0=bg -1=pad."""
        pe = self.pe_layer(points_01)
        pe = jnp.where(labels[..., None] < 0, 0.0, pe)
        pe = pe + jnp.where(
            labels[..., None] < 0, self.not_a_point_embed(), 0.0
        )
        pe = pe + jnp.where(
            labels[..., None] == 0, self.point_embeddings_0(), 0.0
        )
        pe = pe + jnp.where(
            labels[..., None] == 1, self.point_embeddings_1(), 0.0
        )
        return pe

    def embed_mask(self, mask):
        """(B, 4H, 4W, 1) low-res mask prompt → (B, H, W, 256)."""
        x = jax.nn.gelu(self.md_ln1(self.md_conv1(mask)), approximate=False)
        x = jax.nn.gelu(self.md_ln2(self.md_conv2(x)), approximate=False)
        return self.md_conv3(x)

    def dense_pe(self, h, w):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)  # (h, w, 2)
        return self.pe_layer(grid)

    def no_mask(self):
        return self.no_mask_embed()

    def __call__(self, points_01, labels):
        return self.embed_points(points_01, labels)


# ---------------------------------------------------------------------------
# Two-way transformer mask decoder (real SAM structure)
# ---------------------------------------------------------------------------


class _PromptAttention(nn.Module):
    """Decoder attention with separate q/k/v/out projections and optional
    internal downsampling (attention_downsample_rate)."""

    dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        B, N, _ = q.shape
        M = k.shape[1]
        idim = self.dim // self.downsample_rate
        hd = idim // self.num_heads
        qq = nn.Dense(idim, dtype=self.dtype, name="q_proj")(q)
        kk = nn.Dense(idim, dtype=self.dtype, name="k_proj")(k)
        vv = nn.Dense(idim, dtype=self.dtype, name="v_proj")(v)
        qq = qq.reshape(B, N, self.num_heads, hd)
        kk = kk.reshape(B, M, self.num_heads, hd)
        vv = vv.reshape(B, M, self.num_heads, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", qq, kk) / math.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(vv.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vv).reshape(B, N, idim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class _TwoWayBlock(nn.Module):
    dim: int = PROMPT_DIM
    num_heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        # 1. token self-attention
        if self.skip_first_layer_pe:
            queries = _PromptAttention(
                self.dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + _PromptAttention(
                self.dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(queries)
        # 2. cross: tokens → image
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + _PromptAttention(
            self.dim, self.num_heads, 2, dtype=self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(queries)
        # 3. mlp (ReLU — segment_anything MLPBlock default)
        m = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_lin1")(queries)
        m = nn.Dense(self.dim, dtype=self.dtype, name="mlp_lin2")(jax.nn.relu(m))
        queries = queries + m
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(queries)
        # 4. cross: image → tokens
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + _PromptAttention(
            self.dim, self.num_heads, 2, dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm4")(keys)
        return queries, keys


class _MLP3(nn.Module):
    """3-layer ReLU MLP (hypernetwork / iou head), torch keys layers.{0,1,2}."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="layers_0")(x))
        x = jax.nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="layers_1")(x))
        return nn.Dense(self.out, dtype=self.dtype, name="layers_2")(x)


class MaskDecoder(nn.Module):
    """Two-way transformer decoder — real SAM structure and key layout."""

    depth: int = 2
    num_mask_tokens: int = 4  # 3 multimask + 1 single
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_emb, image_pe, point_emb):
        # image_emb (B, H, W, 256); point_emb (B, P, 256)
        B, H, W, C = image_emb.shape
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, C))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (self.num_mask_tokens, C)
        )
        tokens = jnp.concatenate(
            [
                jnp.tile(iou_token[None], (B, 1, 1)),
                jnp.tile(mask_tokens[None], (B, 1, 1)),
                point_emb,
            ],
            axis=1,
        )
        src = image_emb.reshape(B, H * W, C)
        pos_src = image_pe.reshape(B, H * W, C)

        queries, keys = tokens, src
        for i in range(self.depth):
            queries, keys = _TwoWayBlock(
                C, 8, skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layers_{i}",
            )(queries, keys, tokens, pos_src)
        q = queries + tokens
        k = keys + pos_src
        queries = queries + _PromptAttention(
            C, 8, 2, dtype=self.dtype, name="final_attn_token_to_image"
        )(q, k, keys)
        queries = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, name="norm_final_attn"
        )(queries)

        iou_out = queries[:, 0]
        mask_tok_out = queries[:, 1 : 1 + self.num_mask_tokens]  # (B, M, C)

        # upscale image features ×4: ConvT → LayerNorm2d → GELU → ConvT → GELU
        up = keys.reshape(B, H, W, C)
        up = nn.ConvTranspose(
            C // 4, (2, 2), strides=(2, 2), dtype=self.dtype, name="up1"
        )(up)
        up = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="up_ln")(up)
        up = jax.nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(
            C // 8, (2, 2), strides=(2, 2), dtype=self.dtype, name="up2"
        )(up)
        up = jax.nn.gelu(up, approximate=False)  # (B, 4H, 4W, C/8)

        hyper = jnp.stack(
            [
                _MLP3(C, C // 8, dtype=self.dtype, name=f"hyper_{i}")(
                    mask_tok_out[:, i]
                )
                for i in range(self.num_mask_tokens)
            ],
            axis=1,
        )  # (B, M, C/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)
        iou_pred = _MLP3(C, self.num_mask_tokens, dtype=self.dtype, name="iou_head")(
            iou_out
        )
        return masks, iou_pred


class SAM(nn.Module):
    variant: str = "vit_b"
    img_size: int = 1024
    dtype: Dtype = jnp.float32

    def setup(self):
        self.image_encoder = ImageEncoderViT(
            self.variant, img_size=self.img_size, dtype=self.dtype
        )
        self.prompt_encoder = PromptEncoder(dtype=self.dtype)
        self.mask_decoder = MaskDecoder(dtype=self.dtype)

    def encode_image(self, image):
        return self.image_encoder(image)

    def decode_points(self, image_emb, points_01, labels):
        """points_01 (B, P, 2) in [0,1] (pixel-center convention); labels (B, P)
        1=fg, 0=bg, -1=pad.  Dense prompt = no_mask_embed (point-only path).

        Matches segment_anything's ``_embed_points(pad=True)``: with no box
        prompt the reference appends one (0,0) label=-1 padding token, and the
        released checkpoints were trained with that token present — so it is
        appended here unconditionally (this class has no box path)."""
        B = points_01.shape[0]
        points_01 = jnp.concatenate(
            [points_01, jnp.zeros((B, 1, 2), points_01.dtype)], axis=1
        )
        labels = jnp.concatenate(
            [labels, jnp.full((B, 1), -1, labels.dtype)], axis=1
        )
        pe = self.prompt_encoder.embed_points(points_01, labels)
        H, W = image_emb.shape[1:3]
        ipe = jnp.broadcast_to(
            self.prompt_encoder.dense_pe(H, W)[None], image_emb.shape
        )
        src = image_emb + self.prompt_encoder.no_mask()[0]
        return self.mask_decoder(src, ipe, pe)

    def __call__(self, image, points_01, labels):
        if self.is_initializing():
            # materialize the box-corner and mask-prompt parameters so real
            # checkpoints convert with full coverage even though the point-only
            # AMG path never traces them
            self.prompt_encoder.point_embeddings_2()
            self.prompt_encoder.point_embeddings_3()
            self.prompt_encoder.embed_mask(jnp.zeros((1, 8, 8, 1), jnp.float32))
        emb = self.encode_image(image)
        return self.decode_points(emb, points_01, labels)


def build_sam(
    model_type: str = "vit_b",
    checkpoint: Optional[str] = None,
    dtype=jnp.float32,
    img_size: int = 1024,
):
    """sam_model_registry equivalent: returns {model, variables, type, img_size}.

    ``img_size=1024`` (the default) is the released-checkpoint geometry —
    weights load losslessly.  Smaller sizes interpolate pos_embed (and rel-pos
    tables) at conversion and aspect-squash inputs, trading fidelity for
    speed — fine for the offline annotation flows this serves, and a warning
    is emitted when a checkpoint is interpolated."""
    if img_size != 1024 and checkpoint:
        import warnings

        warnings.warn(
            f"SAM img_size={img_size} != released 1024: pos_embed/rel-pos "
            "tables will be interpolated (non-reference geometry)"
        )
    model = SAM(variant=model_type, img_size=img_size, dtype=dtype)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, img_size, img_size, 3), jnp.float32),
        jnp.zeros((1, 1, 2), jnp.float32),
        jnp.zeros((1, 1), jnp.int32),
    )
    if checkpoint:
        from yolo_puncture_tpu.utils.torch_convert import (
            convert_sam_state_dict,
            extract_state_dict,
        )

        sd = extract_state_dict(checkpoint)
        variables, report = convert_sam_state_dict(sd, variables)
        n_bad = len(report["unmatched_torch_keys"]) + len(report["unfilled_flax_leaves"])
        if n_bad:
            import warnings

            warnings.warn(
                f"{checkpoint}: {len(report['unmatched_torch_keys'])} torch keys "
                f"unmatched, {len(report['unfilled_flax_leaves'])} flax leaves at init"
            )
    return {"model": model, "variables": variables, "type": model_type,
            "img_size": img_size}


sam_model_registry = {
    "vit_b": functools.partial(build_sam, "vit_b"),
    "vit_l": functools.partial(build_sam, "vit_l"),
    "vit_h": functools.partial(build_sam, "vit_h"),
}
class SamAutomaticMaskGenerator:
    """Grid-prompted automatic mask generation (AMG surface of the reference).

    points_per_side grid (downscaled per crop layer), batched point prompts through
    the decoder, stability-score + IoU filtering, per-crop box NMS dedupe.
    """

    def __init__(
        self,
        sam: Dict,
        points_per_side: int = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.5,
        stability_score_thresh: float = 0.6,
        box_nms_thresh: float = 0.7,
        crop_n_layers: int = 0,
        crop_n_points_downscale_factor: int = 1,
        min_mask_region_area: int = 0,
        input_size: Optional[int] = None,
    ):
        self.sam = sam
        self.points_per_side = points_per_side
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_downscale = crop_n_points_downscale_factor
        self.min_mask_region_area = min_mask_region_area
        self.input_size = input_size or sam.get("img_size", 256)

        model, variables = sam["model"], sam["variables"]

        @jax.jit
        def run(variables, image, points, labels):
            emb = model.apply(variables, image, method=SAM.encode_image)
            embs = jnp.repeat(emb, points.shape[0], axis=0)
            masks, iou = model.apply(
                variables, embs, points, labels, method=SAM.decode_points
            )
            return masks, iou

        self._run = run

    def _grid(self, n):
        side = (np.arange(n) + 0.5) / n
        gx, gy = np.meshgrid(side, side)
        return np.stack([gx.ravel(), gy.ravel()], -1)  # (n², 2) in [0,1]

    @staticmethod
    def _box_nms(cands, thresh):
        """Greedy box-NMS over (mask, score, payload) triples, highest score
        first; returns kept (mask, score, payload, box) tuples."""
        items = []
        for m, score, payload in cands:
            ys, xs = np.where(m)
            if len(xs) == 0:
                continue
            box = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
            items.append((box, score, (m, payload)))
        return [
            (m, score, payload, box)
            for box, score, (m, payload) in SamAutomaticMaskGenerator._nms_on_boxes(
                items, thresh
            )
        ]

    @staticmethod
    def _nms_on_boxes(items, thresh):
        """Greedy NMS over (box, score, payload) with PRECOMPUTED boxes —
        no per-candidate mask scans."""
        kept, boxes = [], []
        for box, score, payload in sorted(items, key=lambda t: -t[1]):
            dup = False
            for kb in boxes:
                ix1, iy1 = max(box[0], kb[0]), max(box[1], kb[1])
                ix2, iy2 = min(box[2], kb[2]), min(box[3], kb[3])
                inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
                union = (
                    (box[2] - box[0]) * (box[3] - box[1])
                    + (kb[2] - kb[0]) * (kb[3] - kb[1])
                    - inter
                )
                if union > 0 and inter / union > thresh:
                    dup = True
                    break
            if dup:
                continue
            boxes.append(box)
            kept.append((box, score, payload))
        return kept

    def generate(self, image: np.ndarray) -> List[Dict]:
        import cv2

        h, w = image.shape[:2]
        S = self.input_size
        mean = np.array([123.675, 116.28, 103.53])
        std = np.array([58.395, 57.12, 57.375])

        crops = [(0, 0, w, h, self.points_per_side)]
        for layer in range(1, self.crop_n_layers + 1):
            n = 2 ** layer
            pps = max(1, self.points_per_side // (self.crop_downscale ** layer))
            for i in range(n):
                for j in range(n):
                    crops.append(
                        (j * w // n, i * h // n, (j + 1) * w // n, (i + 1) * h // n, pps)
                    )

        all_cands: List = []  # (full-frame bool mask at model res scale? no: full-frame (h, w)) 
        results: List[Dict] = []
        for (cx1, cy1, cx2, cy2, pps) in crops:
            ch, cw = cy2 - cy1, cx2 - cx1
            if ch <= 0 or cw <= 0:
                continue
            # encode the CROPPED region: zoomed-in detail is the point of crop
            # layers (upstream SamAutomaticMaskGenerator crops the image and
            # re-grids points inside the crop; a full-frame re-run at lower
            # point density would add nothing but duplicates)
            crop_img = image[cy1:cy2, cx1:cx2]
            img = cv2.resize(crop_img, (S, S)).astype(np.float32)
            img = ((img - mean) / std)[None]
            pts = self._grid(pps)  # [0,1]² relative to THIS crop
            B = self.points_per_batch
            cand_masks, cand_scores = [], []
            for s in range(0, len(pts), B):
                chunk = pts[s : s + B]
                if len(chunk) < B:
                    chunk = np.concatenate([chunk, np.zeros((B - len(chunk), 2))])
                points = jnp.asarray(chunk[:, None, :], jnp.float32)  # (B, 1, 2)
                labels = jnp.ones((B, 1), jnp.int32)
                masks, iou = self._run(self.sam["variables"], jnp.asarray(img), points, labels)
                masks = np.asarray(masks)
                iou = np.asarray(iou)
                # multimask_output semantics: choose among the 3 multimask
                # tokens (indices 1..3); token 0 is the single-mask output
                best = iou[:, 1:].argmax(-1) + 1
                for b in range(min(B, len(pts) - s)):
                    m = masks[b, best[b]]
                    score = float(iou[b, best[b]])
                    if score < self.pred_iou_thresh:
                        continue
                    # stability: IoU between thresholds at ±Δ
                    hi = m > 1.0
                    lo = m > -1.0
                    stab = hi.sum() / max(lo.sum(), 1)
                    if stab < self.stability_score_thresh:
                        continue
                    cand_masks.append(m > 0)
                    cand_scores.append(score)

            # dedupe by box NMS within the crop (crop-res masks — cheap scans)
            for m, score, _payload, box in self._box_nms(
                [(m, sc, None) for m, sc in zip(cand_masks, cand_scores)],
                self.box_nms_thresh,
            ):
                # paste the crop-resolution mask back into full-frame coords
                mh, mw = m.shape
                seg_crop = cv2.resize(
                    m.astype(np.uint8), (cw, ch), interpolation=cv2.INTER_NEAREST
                ).astype(bool)
                seg = np.zeros((h, w), bool)
                seg[cy1:cy2, cx1:cx2] = seg_crop
                # full-frame box from the ALREADY-computed crop-space box —
                # the cross-crop NMS below must not rescan (h, w) masks
                fbox = (
                    cx1 + box[0] * cw / mw, cy1 + box[1] * ch / mh,
                    cx1 + box[2] * cw / mw, cy1 + box[3] * ch / mh,
                )
                all_cands.append((fbox, score, (seg, (cx1, cy1, cx2, cy2))))

        # cross-crop dedupe (upstream crop_nms): box-only NMS, no mask scans
        kept = self._nms_on_boxes(all_cands, self.box_nms_thresh)
        for _fbox, score, (seg, crop_box) in kept:
            ys, xs = np.where(seg)
            if len(xs) == 0:
                continue
            bx1, by1 = int(xs.min()), int(ys.min())
            bw, bh = int(xs.max() - bx1 + 1), int(ys.max() - by1 + 1)
            if self.min_mask_region_area and seg.sum() < self.min_mask_region_area:
                continue
            results.append(
                {
                    "segmentation": seg,
                    "bbox": [bx1, by1, bw, bh],
                    "area": int(seg.sum()),
                    "predicted_iou": score,
                    "crop_box": list(crop_box),
                    "stability_score": 1.0,
                    "point_coords": [[0, 0]],
                }
            )
        return results


register_model(lambda model_type="vit_b", **kw: SAM(variant=model_type), name="sam")
