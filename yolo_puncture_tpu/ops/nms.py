"""Detection selection: v8/v11 NMS and v10 NMS-free top-k — fixed shapes under jit.

Contracts (SURVEY.md §3.4): v8/v11 postprocess = conf filter → class-aware NMS;
v10 = one-to-one branch, top-k by confidence, **no NMS**.  Both return padded
fixed-size (max_det) results with a validity count so downstream stages stay
shape-static for XLA.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def box_iou_xyxy(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU matrix between (N, 4) and (M, 4) xyxy boxes."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _nms_single(
    boxes: jax.Array,
    scores: jax.Array,
    classes: jax.Array,
    iou_thres: float,
    max_det: int,
    class_agnostic: bool = False,
    pre_topk: int = 1024,
) -> Dict[str, jax.Array]:
    """Greedy NMS on one image. boxes (A,4) xyxy, scores (A,), classes (A,) int32.

    Candidates are pre-reduced to ``pre_topk`` by score (the standard accelerator
    pattern: sort once, then an O(max_det · pre_topk) suppression sweep of
    vectorized IoU rows — no data-dependent shapes).
    """
    A = scores.shape[0]
    k = min(pre_topk, A)
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]
    top_classes = classes[order]

    # class-aware: offset boxes per class so cross-class IoU is 0 (torchvision trick)
    if class_agnostic:
        nms_boxes = top_boxes
    else:
        span = jnp.max(boxes) + 1.0
        offset = top_classes.astype(top_boxes.dtype)[:, None] * span
        nms_boxes = top_boxes + offset

    iou = box_iou_xyxy(nms_boxes, nms_boxes)

    def body(i, keep):
        # suppress j > i overlapping an unsuppressed i
        row = iou[i]
        suppress = (row > iou_thres) & (jnp.arange(k) > i) & keep[i]
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, k, body, jnp.ones((k,), bool))
    keep = keep & (top_scores > 0)

    # compact the kept detections to the front, padded to max_det
    keep_scores = jnp.where(keep, top_scores, -1.0)
    kk = min(max_det, k)
    sel_scores, sel_idx = jax.lax.top_k(keep_scores, kk)
    pad = max_det - kk
    if pad:
        sel_scores = jnp.pad(sel_scores, (0, pad), constant_values=-1.0)
        sel_idx = jnp.pad(sel_idx, (0, pad))
    valid = sel_scores > 0
    return {
        "boxes": jnp.where(valid[:, None], top_boxes[sel_idx], 0.0),
        "scores": jnp.where(valid, sel_scores, 0.0),
        "classes": jnp.where(valid, top_classes[sel_idx], -1),
        "indices": jnp.where(valid, order[sel_idx], -1),  # into the flat anchor dim
        "valid": valid,
        "count": jnp.sum(valid.astype(jnp.int32)),
    }


def batched_nms(
    boxes: jax.Array,
    probs: jax.Array,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    max_det: int = 300,
    class_agnostic: bool = False,
) -> Dict[str, jax.Array]:
    """v8/v11 postprocess. boxes (B, A, 4), probs (B, A, nc) sigmoid scores.

    Per-anchor class = argmax; anchors below conf are masked before NMS.
    """
    scores = jnp.max(probs, axis=-1)
    classes = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    scores = jnp.where(scores >= conf_thres, scores, 0.0)
    return jax.vmap(
        lambda b, s, c: _nms_single(b, s, c, iou_thres, max_det, class_agnostic)
    )(boxes, scores, classes)


def v10_topk_select(
    boxes: jax.Array, probs: jax.Array, conf_thres: float = 0.25, max_det: int = 300
) -> Dict[str, jax.Array]:
    """YOLOv10 NMS-free selection: flatten (A, nc) scores, take global top-max_det.

    Matches ultralytics v10postprocess: topk over per-(anchor, class) scores; the
    same anchor may appear once per class.
    """
    B, A, nc = probs.shape
    flat = probs.reshape(B, A * nc)

    k = min(max_det, A * nc)

    if k <= 32:
        # small k (the streaming-pipeline case): k unrolled argmax+mask passes —
        # exact, same tie-breaking as top_k (lowest index first), and far
        # cheaper than lax.top_k's full sort over A·nc scores
        work = flat
        rows = jnp.arange(B)
        ss, ii = [], []
        for _ in range(k):
            i = jnp.argmax(work, axis=1)
            ss.append(work[rows, i])
            ii.append(i)
            work = work.at[rows, i].set(-jnp.inf)
        sel_scores = jnp.stack(ss, axis=1)
        idx = jnp.stack(ii, axis=1).astype(jnp.int32)
    else:
        sel_scores, idx = jax.lax.top_k(flat, k)
    if k < max_det:
        sel_scores = jnp.pad(
            sel_scores, ((0, 0), (0, max_det - k)), constant_values=-1.0
        )
        idx = jnp.pad(idx, ((0, 0), (0, max_det - k)))
    anchor = idx // nc
    cls = (idx % nc).astype(jnp.int32)
    valid = sel_scores >= conf_thres
    sel_boxes = jnp.take_along_axis(boxes, anchor[..., None], axis=1)
    return {
        "boxes": jnp.where(valid[..., None], sel_boxes, 0.0),
        "scores": jnp.where(valid, sel_scores, 0.0),
        "classes": jnp.where(valid, cls, -1),
        "indices": jnp.where(valid, anchor, -1),
        "valid": valid,
        "count": jnp.sum(valid.astype(jnp.int32), axis=-1),
    }


def select_detections(
    head_out: Dict[str, jax.Array],
    nms_free: bool,
    conf_thres: float,
    iou_thres: float = 0.7,
    max_det: int = 300,
) -> Dict[str, jax.Array]:
    """Dispatch on head type; gathers mask coefficients for selected anchors."""
    boxes, probs = head_out["boxes"], head_out["probs"]
    if nms_free:
        det = v10_topk_select(boxes, probs, conf_thres, max_det)
    else:
        det = batched_nms(boxes, probs, conf_thres, iou_thres, max_det)
    if "coeffs" in head_out:
        coeffs = head_out["coeffs"]  # (B, A, nm)
        idx = jnp.clip(det["indices"], 0)
        det["coeffs"] = jnp.take_along_axis(
            coeffs, idx[..., None], axis=1
        ) * det["valid"][..., None]
    return det
