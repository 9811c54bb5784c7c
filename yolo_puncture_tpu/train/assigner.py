"""Task-aligned label assignment (TAL) — the assigner behind YOLOv8/v10 training.

v8/v11 use one-to-many TAL (topk=10); YOLOv10's consistent dual assignment adds a
one-to-one head trained with topk=1 TAL (SURVEY.md §2.2 'YOLOv10 architecture':
dual-assignment NMS-free head; hard part #2).  Everything here is static-shape,
vmapped over the batch: gt boxes are padded to a fixed M with a validity mask.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def bbox_ciou(a, b, eps: float = 1e-7):
    """Complete IoU between broadcastable xyxy boxes (…, 4)."""
    ax1, ay1, ax2, ay2 = jnp.split(a, 4, axis=-1)
    bx1, by1, bx2, by2 = jnp.split(b, 4, axis=-1)
    aw, ah = ax2 - ax1, ay2 - ay1
    bw, bh = bx2 - bx1, by2 - by1

    inter_w = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0)
    inter_h = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0)
    inter = inter_w * inter_h
    union = aw * ah + bw * bh - inter + eps
    iou = inter / union

    cw = jnp.maximum(ax2, bx2) - jnp.minimum(ax1, bx1)
    ch = jnp.maximum(ay2, by2) - jnp.minimum(ay1, by1)
    c2 = cw * cw + ch * ch + eps
    rho2 = ((bx1 + bx2 - ax1 - ax2) ** 2 + (by1 + by2 - ay1 - ay2) ** 2) / 4
    v = (4 / math.pi ** 2) * (
        jnp.arctan(bw / (bh + eps)) - jnp.arctan(aw / (ah + eps))
    ) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return (iou - (rho2 / c2 + v * alpha)).squeeze(-1)


def bbox_iou_plain(a, b, eps: float = 1e-7):
    ax1, ay1, ax2, ay2 = jnp.split(a, 4, axis=-1)
    bx1, by1, bx2, by2 = jnp.split(b, 4, axis=-1)
    inter_w = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0)
    inter_h = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0)
    inter = inter_w * inter_h
    union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter + eps
    return (inter / union).squeeze(-1)


def task_aligned_assign(
    pd_scores,      # (B, A, nc) sigmoid probs
    pd_bboxes,      # (B, A, 4) xyxy px
    anc_points,     # (A, 2) px
    gt_labels,      # (B, M) int32
    gt_bboxes,      # (B, M, 4) xyxy px
    mask_gt,        # (B, M) bool
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
    conf_floor: float = 1e-3,
) -> Dict[str, jax.Array]:
    """Returns target_labels (B,A), target_bboxes (B,A,4), target_scores (B,A,nc),
    fg_mask (B,A), target_gt_idx (B,A)."""
    B, A, nc = pd_scores.shape
    M = gt_labels.shape[1]

    def one(scores, boxes, glabels, gboxes, gmask):
        # anchors inside gt boxes: (M, A)
        lt = anc_points[None] - gboxes[:, None, :2]      # (M, A, 2)
        rb = gboxes[:, None, 2:] - anc_points[None]
        in_gts = jnp.min(jnp.concatenate([lt, rb], -1), -1) > eps

        # alignment metric
        cls_score = jnp.take_along_axis(
            scores.T, jnp.clip(glabels, 0)[:, None], axis=0
        )  # (M, A) — scores.T is (nc, A); take per-gt class row
        overlaps = bbox_ciou(gboxes[:, None, :], boxes[None, :, :])  # (M, A)
        overlaps = jnp.clip(overlaps, 0)
        # the ultralytics alignment metric, UNmodified — target soft scores
        # derive from it below, and its per-gt normalization
        # (metric/pos_align) is scale-invariant under a uniform confidence
        # collapse, so the raw metric stays well-behaved even at conf ~1e-20
        metric = (cls_score ** alpha) * (overlaps ** beta)
        valid = in_gts & gmask[:, None]
        metric = jnp.where(valid, metric, 0.0)

        # topk per gt — ultralytics gating: a gt keeps ALL its topk candidates as
        # long as its BEST metric exceeds eps (per-gt, not per-element; early in
        # training most candidate metrics are ~0 and per-element gating would
        # starve the assigner)
        k = min(topk, A)
        topv, topi = jax.lax.top_k(metric, k)  # (M, k)
        # confidence floor — GATE ONLY: if a head's confidence collapses (the
        # topk-1 o2o branch at 640² drove itself to ~1e-20 in r3), conf^α
        # underflows this aliveness gate and the GT permanently loses ALL
        # positives — a cold-start deadlock (no positive → BCE keeps pushing
        # down).  The r3 fix floored the metric ITSELF, which also rescaled
        # the target soft scores; r4 scopes the floor to the gate: aliveness
        # is judged as if confidence were at least conf_floor, while targets
        # keep the raw-metric normalization.  Inert once conf ≫ conf_floor.
        gate = (jnp.maximum(cls_score, conf_floor) ** alpha) * (overlaps ** beta)
        gate = jnp.where(valid, gate, 0.0)
        gt_alive = jnp.max(gate, axis=1, keepdims=True) > eps  # (M, 1)
        mask_topk = jnp.zeros((M, A), bool)
        rows = jnp.arange(M)[:, None]
        mask_topk = mask_topk.at[rows, topi].set(
            jnp.broadcast_to(gt_alive, topv.shape)
        )
        mask_pos = mask_topk & valid  # (M, A)

        # conflict resolution: anchor claimed by >1 gt → highest overlap wins
        fg_counts = jnp.sum(mask_pos, 0)  # (A,)
        overlaps_masked = jnp.where(mask_pos, overlaps, -1.0)
        best_gt = jnp.argmax(overlaps_masked, 0)  # (A,)
        multi = fg_counts > 1
        keep = jnp.where(
            multi[None, :], jnp.arange(M)[:, None] == best_gt[None, :], mask_pos
        ) & mask_pos
        fg = jnp.any(keep, 0)  # (A,)
        tgt_idx = jnp.argmax(keep, 0)  # (A,)

        t_labels = jnp.where(fg, glabels[tgt_idx], 0)
        t_boxes = gboxes[tgt_idx] * fg[:, None]

        # normalized target scores (ultralytics norm_align_metric)
        metric_pos = metric * keep
        pos_align = jnp.max(metric_pos, axis=1, keepdims=True)          # (M, 1)
        pos_overlap = jnp.max(jnp.where(keep, overlaps, 0.0), axis=1, keepdims=True)
        # denominator floor far below any representable metric (NOT eps=1e-9:
        # at collapsed confidence the metric is ~1e-12-1e-22 and an additive
        # eps would crush the normalized targets toward zero, soft-reviving
        # the cold-start deadlock the gate floor above exists to break)
        norm = metric_pos * pos_overlap / jnp.maximum(pos_align, 1e-30)  # (M, A)
        anchor_score = jnp.max(norm, axis=0)                             # (A,)
        t_scores = jax.nn.one_hot(t_labels, nc) * (anchor_score * fg)[:, None]

        return {
            "target_labels": t_labels,
            "target_bboxes": t_boxes,
            "target_scores": t_scores,
            "fg_mask": fg,
            "target_gt_idx": tgt_idx,
        }

    return jax.vmap(one)(pd_scores, pd_bboxes, gt_labels, gt_bboxes, mask_gt)
