"""Segment Anything (SAM): ViT encoder + prompt encoder + mask decoder + AMG.

Reference usage contract (yolo_seg/utils/segment_anything.py:73-89, SURVEY.md §2.2
'SAM automatic mask generator'): ``sam_model_registry[vit_h|vit_l|vit_b](ckpt)``;
``SamAutomaticMaskGenerator(sam, crop_n_layers=1,
crop_n_points_downscale_factor=2).generate(image)`` → list of dicts with
``segmentation`` (bool HW), ``bbox`` (xywh), ``area``, ``crop_box``; consumed by
the needle-heuristic ranking (ops/geometry.filter_masks).

TPU notes: the encoder is ViTDet-style (windowed attention + periodic global
blocks) in NHWC; prompt batches run through the two-way decoder as one batched
matmul program.  Offline annotation tool (SURVEY §7.9) — throughput matters less
than the predict path, so no bespoke kernels here.
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

IMG_SIZE = 1024
PATCH = 16
PROMPT_DIM = 256


class _Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, C)
        B, N, C = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, self.num_heads, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # (B, N, h, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * hd ** -0.5
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class _Block(nn.Module):
    dim: int
    num_heads: int
    window: int  # 0 = global
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.window > 0:
            w = self.window
            ph = (w - H % w) % w
            pw = (w - W % w) % w
            xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            Hp, Wp = H + ph, W + pw
            xw = xp.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5)
            xw = xw.reshape(-1, w * w, C)
            xw = _Attention(self.dim, self.num_heads, self.dtype, name="attn")(xw)
            xw = xw.reshape(B, Hp // w, Wp // w, w, w, C).transpose(0, 1, 3, 2, 4, 5)
            x = xw.reshape(B, Hp, Wp, C)[:, :H, :W]
        else:
            xs = x.reshape(B, H * W, C)
            xs = _Attention(self.dim, self.num_heads, self.dtype, name="attn")(xs)
            x = xs.reshape(B, H, W, C)
        x = shortcut + x
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.dim * 4, dtype=self.dtype, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    variant: str = "vit_b"
    window: int = 14
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, 1024, 1024, 3) normalized
        dim, depth, heads, global_idx = _VIT_CFG[self.variant]
        B = x.shape[0]
        x = nn.Conv(
            dim, (PATCH, PATCH), strides=(PATCH, PATCH), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)  # (B, 64, 64, dim)
        Hp, Wp = x.shape[1:3]
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, IMG_SIZE // PATCH, IMG_SIZE // PATCH, dim)
        )
        x = x + pos[:, :Hp, :Wp]
        for i in range(depth):
            x = _Block(
                dim, heads, window=0 if i in global_idx else self.window,
                dtype=self.dtype, name=f"block_{i}",
            )(x)
        # neck: 1x1 → 3x3 with LayerNorm2d, to 256 channels
        x = nn.Conv(PROMPT_DIM, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(
            PROMPT_DIM, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="neck_conv2",
        )(x)
        return nn.LayerNorm(dtype=self.dtype, name="neck_ln2")(x)  # (B, 64, 64, 256)


class MaskDecoder(nn.Module):
    """Two-way transformer decoder: prompt tokens ↔ image embedding."""

    depth: int = 2
    num_mask_tokens: int = 4  # iou token handled separately
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_emb, image_pe, point_emb):
        # image_emb (B, H, W, 256); point_emb (B, P, 256)
        B, H, W, C = image_emb.shape
        iou_token = self.param("iou_token", nn.initializers.normal(0.02), (1, 1, C))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(0.02), (1, self.num_mask_tokens, C)
        )
        tokens = jnp.concatenate(
            [
                jnp.tile(iou_token, (B, 1, 1)),
                jnp.tile(mask_tokens, (B, 1, 1)),
                point_emb,
            ],
            axis=1,
        )
        src = (image_emb + image_pe).reshape(B, H * W, C)

        q = tokens
        for i in range(self.depth):
            # self-attention on tokens
            qn = nn.LayerNorm(dtype=self.dtype, name=f"sa_ln_{i}")(q)
            q = q + _Attention(C, 8, self.dtype, name=f"sa_{i}")(qn)
            # cross: tokens → image
            qn = nn.LayerNorm(dtype=self.dtype, name=f"ca_ln_{i}")(q)
            cross = _CrossAttention(C, 8, self.dtype, name=f"ca_{i}")(qn, src)
            q = q + cross
            # mlp
            qn = nn.LayerNorm(dtype=self.dtype, name=f"mlp_ln_{i}")(q)
            m = nn.Dense(C * 4, dtype=self.dtype, name=f"mlp1_{i}")(qn)
            m = nn.Dense(C, dtype=self.dtype, name=f"mlp2_{i}")(jax.nn.gelu(m))
            q = q + m
            # cross: image → tokens
            srcn = nn.LayerNorm(dtype=self.dtype, name=f"ci_ln_{i}")(src)
            src = src + _CrossAttention(C, 8, self.dtype, name=f"ci_{i}")(srcn, q)

        mask_tok_out = q[:, 1 : 1 + self.num_mask_tokens]      # (B, M, C)
        iou_out = q[:, 0]

        # upscale image features ×4 and predict masks via hypernetwork dot
        up = src.reshape(B, H, W, C)
        up = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2), dtype=self.dtype, name="up1")(up)
        up = jax.nn.gelu(up)
        up = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2), dtype=self.dtype, name="up2")(up)
        up = jax.nn.gelu(up)  # (B, 4H, 4W, C/8)
        hyper = nn.Dense(C // 8, dtype=self.dtype, name="hyper")(mask_tok_out)  # (B, M, C/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)
        iou_pred = nn.Dense(self.num_mask_tokens, dtype=self.dtype, name="iou_head")(iou_out)
        return masks, iou_pred


class _CrossAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, kv):
        B, N, C = q.shape
        M = kv.shape[1]
        hd = self.dim // self.num_heads
        qq = nn.Dense(self.dim, dtype=self.dtype, name="q")(q).reshape(B, N, self.num_heads, hd)
        kk = nn.Dense(self.dim, dtype=self.dtype, name="k")(kv).reshape(B, M, self.num_heads, hd)
        vv = nn.Dense(self.dim, dtype=self.dtype, name="v")(kv).reshape(B, M, self.num_heads, hd)
        attn = jnp.einsum("bnhd,bmhd->bhnm", qq, kk) * hd ** -0.5
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(vv.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vv).reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SAM(nn.Module):
    variant: str = "vit_b"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.variant, dtype=self.dtype)
        self.mask_decoder = MaskDecoder(dtype=self.dtype)
        self.point_embed_pos = self.param(
            "point_embed_pos", nn.initializers.normal(1.0), (2, PROMPT_DIM)
        )
        self.point_embed_lbl = self.param(
            "point_embed_lbl", nn.initializers.normal(0.02), (2, PROMPT_DIM)
        )
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, PROMPT_DIM // 2)
        )

    def _pe_encode(self, coords_01):
        """Random-Fourier positional encoding of [0,1]² coords (SAM scheme)."""
        x = (2 * coords_01 - 1) @ self.pe_gaussian
        return jnp.concatenate([jnp.sin(2 * jnp.pi * x), jnp.cos(2 * jnp.pi * x)], -1)

    def image_pe(self, h, w):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)  # (h, w, 2)
        return self._pe_encode(grid)

    def encode_image(self, image):
        return self.image_encoder(image)

    def decode_points(self, image_emb, points_01, labels):
        """points_01 (B, P, 2) in [0,1]; labels (B, P) 1=fg, 0=bg, -1=pad."""
        B = points_01.shape[0]
        pe = self._pe_encode(points_01)
        lbl = jnp.where(
            labels[..., None] > 0, self.point_embed_lbl[1], self.point_embed_lbl[0]
        )
        pe = jnp.where(labels[..., None] < 0, 0.0, pe + lbl)
        H, W = image_emb.shape[1:3]
        ipe = jnp.broadcast_to(self.image_pe(H, W)[None], image_emb.shape)
        return self.mask_decoder(image_emb, ipe, pe)

    def __call__(self, image, points_01, labels):
        emb = self.encode_image(image)
        return self.decode_points(emb, points_01, labels)


def build_sam(model_type: str = "vit_b", checkpoint: Optional[str] = None, dtype=jnp.float32):
    """sam_model_registry equivalent: returns (module, variables)."""
    model = SAM(variant=model_type, dtype=dtype)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 256, 256, 3), jnp.float32),
        jnp.zeros((1, 1, 2), jnp.float32),
        jnp.zeros((1, 1), jnp.int32),
    )
    if checkpoint:
        from yolo_puncture_tpu.utils.torch_convert import (
            convert_classifier_state_dict,
            extract_state_dict,
        )

        sd = extract_state_dict(checkpoint)
        variables, _ = convert_classifier_state_dict(sd, variables)
    return {"model": model, "variables": variables, "type": model_type}


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
        input_size: int = 256,
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
        self.input_size = input_size

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
                best = iou.argmax(-1)
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
