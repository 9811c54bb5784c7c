"""Detection / segmentation training losses (v8 TAL and v10 dual assignment).

Loss composition mirrors the ultralytics contract the reference trains with
(SURVEY.md §2.2 'YOLO train/val CLI'): BCE cls on task-aligned soft targets,
CIoU box loss, DFL on the discretized box distribution, and per-positive
proto-mask BCE for segmentation.  YOLOv10: total = one-to-many(topk=10) +
one-to-one(topk=1) branches (consistent dual assignment).

Static-shape design: gt padded to M boxes; segment mask loss gathers a fixed
``max_pos`` positives per image (top target-score anchors) instead of dynamic
indexing — XLA-friendly, no recompiles.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from yolo_puncture_tpu.nn.heads import bbox2dist, dist2bbox, make_anchors
from yolo_puncture_tpu.nn.common import dfl_expectation
from yolo_puncture_tpu.train.assigner import bbox_ciou, task_aligned_assign


def _flatten_feats(box_feats, cls_feats, reg_max, nc):
    B = box_feats[0].shape[0]
    box = jnp.concatenate([f.reshape(B, -1, 4 * reg_max) for f in box_feats], 1)
    cls = jnp.concatenate([f.reshape(B, -1, nc) for f in cls_feats], 1)
    return box, cls


def _bce(logits, targets):
    return optax_sigmoid_bce(logits, targets)


def optax_sigmoid_bce(logits, labels):
    """Elementwise sigmoid BCE (stable form)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -labels * log_p - (1.0 - labels) * log_not_p


def _dfl_loss(pred_dist, target, reg_max):
    """Distribution focal loss: CE to the two integer bins around the target.

    pred_dist: (N, 4, reg_max) logits; target: (N, 4) in [0, reg_max-1]."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    ce_l = -jnp.take_along_axis(logp, jnp.clip(tl, 0, reg_max - 1)[..., None], -1)[..., 0]
    ce_r = -jnp.take_along_axis(logp, jnp.clip(tr, 0, reg_max - 1)[..., None], -1)[..., 0]
    return (ce_l * wl + ce_r * wr).mean(-1)


def _branch_loss(
    box_feats,
    cls_feats,
    batch: Dict[str, jax.Array],
    strides,
    nc: int,
    reg_max: int,
    topk: int,
    hyp: Dict[str, float],
    coeff_feats=None,
    proto=None,
    max_pos: int = 48,
):
    """Loss for one head branch.  batch: gt_labels (B,M), gt_bboxes (B,M,4) px,
    mask_gt (B,M), optional gt_masks (B,M,Hp,Wp) at proto resolution."""
    shapes = [f.shape[1:3] for f in box_feats]
    anchors, stride_t = make_anchors(shapes, strides)  # (A,2) cells, (A,1)
    anc_px = anchors * stride_t

    box_dist, cls_logits = _flatten_feats(box_feats, cls_feats, reg_max, nc)
    B, A = cls_logits.shape[:2]
    pred_dist_px = dfl_expectation(box_dist, reg_max)  # (B, A, 4) in cells
    pred_boxes = dist2bbox(pred_dist_px, anchors[None]) * stride_t[None]  # px
    pred_scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))

    tgt = task_aligned_assign(
        jax.lax.stop_gradient(pred_scores),
        jax.lax.stop_gradient(pred_boxes),
        anc_px,
        batch["gt_labels"],
        batch["gt_bboxes"],
        batch["mask_gt"],
        topk=topk,
    )
    fg = tgt["fg_mask"]
    t_scores = tgt["target_scores"]
    score_sum = jnp.maximum(t_scores.sum(), 1.0)

    # cls
    loss_cls = optax_sigmoid_bce(cls_logits.astype(jnp.float32), t_scores).sum() / score_sum

    # box (CIoU) weighted by target score
    weight = t_scores.sum(-1) * fg
    iou = bbox_ciou(pred_boxes, tgt["target_bboxes"])
    loss_box = ((1.0 - iou) * weight).sum() / score_sum

    # dfl
    t_dist = bbox2dist(tgt["target_bboxes"] / stride_t[None], anchors[None], reg_max)
    dfl = _dfl_loss(
        box_dist.reshape(B, A, 4, reg_max).astype(jnp.float32), t_dist, reg_max
    )
    loss_dfl = (dfl * weight).sum() / score_sum

    out = {
        "cls": loss_cls,
        "box": loss_box,
        "dfl": loss_dfl,
    }

    # segmentation mask loss
    if coeff_feats is not None and proto is not None and "gt_masks" in batch:
        nm = proto.shape[-1]
        coeffs = jnp.concatenate(
            [f.reshape(B, -1, nm) for f in coeff_feats], 1
        )  # (B, A, nm)
        Hp, Wp = proto.shape[1:3]

        def one(coef, pr, gt_masks, gboxes, t_gt_idx, fg_i, w_i):
            # fixed max_pos positives by weight
            sel_w, sel = jax.lax.top_k(w_i, max_pos)
            sel_valid = sel_w > 0
            c = coef[sel]                                   # (P, nm)
            m_pred = jnp.einsum("pn,hwn->phw", c, pr)       # (P, Hp, Wp) logits
            gt_idx = t_gt_idx[sel]
            m_gt = gt_masks[gt_idx]                         # (P, Hp, Wp)
            # gboxes is PER-ANCHOR (assigned target box) → index by anchor ids
            boxes_p = gboxes[sel] / 4.0                     # proto-res coords
            ys = jnp.arange(Hp, dtype=jnp.float32)[None, :, None]
            xs = jnp.arange(Wp, dtype=jnp.float32)[None, None, :]
            inside = (
                (xs >= boxes_p[:, 0, None, None]) & (xs < boxes_p[:, 2, None, None])
                & (ys >= boxes_p[:, 1, None, None]) & (ys < boxes_p[:, 3, None, None])
            )
            bce = optax_sigmoid_bce(m_pred.astype(jnp.float32), m_gt) * inside
            area = jnp.clip(
                (boxes_p[:, 2] - boxes_p[:, 0]) * (boxes_p[:, 3] - boxes_p[:, 1]), 1.0
            )
            per_pos = bce.sum((1, 2)) / area
            return jnp.where(sel_valid, per_pos, 0.0).sum() / jnp.maximum(
                sel_valid.sum(), 1
            )

        loss_seg = jax.vmap(one)(
            coeffs,
            proto.astype(jnp.float32),
            batch["gt_masks"].astype(jnp.float32),
            tgt["target_bboxes"],
            tgt["target_gt_idx"],
            fg,
            weight,
        ).mean()
        out["seg"] = loss_seg

    return out


def detection_loss(
    head_out: Dict[str, jax.Array],
    batch: Dict[str, jax.Array],
    nc: int,
    hyp: Optional[Dict[str, float]] = None,
    strides=(8, 16, 32),
    reg_max: int = 16,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss for one forward pass (auto-detects segment / v10 dual heads)."""
    hyp = hyp or {"box": 7.5, "cls": 0.5, "dfl": 1.5, "seg": 1.0}
    B = head_out["boxes"].shape[0]

    seg_args = {}
    if "proto" in head_out:
        seg_args = {"coeff_feats": head_out["coeff_feats"], "proto": head_out["proto"]}

    main = _branch_loss(
        head_out["box_feats"], head_out["cls_feats"], batch, strides, nc, reg_max,
        topk=10, hyp=hyp, **seg_args,
    )
    losses = dict(main)
    total = (
        hyp["box"] * main["box"] + hyp["cls"] * main["cls"] + hyp["dfl"] * main["dfl"]
    )
    if "seg" in main:
        total = total + hyp.get("seg", 1.0) * main["seg"]

    if "one2one_box_feats" in head_out:
        o2o = _branch_loss(
            head_out["one2one_box_feats"], head_out["one2one_cls_feats"], batch,
            strides, nc, reg_max, topk=1, hyp=hyp,
        )
        for k, v in o2o.items():
            losses[f"o2o_{k}"] = v
        total = total + (
            hyp["box"] * o2o["box"] + hyp["cls"] * o2o["cls"] + hyp["dfl"] * o2o["dfl"]
        )

    losses["total"] = total * B  # ultralytics scales by batch size
    return losses["total"], losses
