"""Full-model fp32 parity vs an independent torch implementation with REAL
ultralytics key naming (VERDICT.md round-1 item 2).

Chain under test, end to end:
  torch model (tests/torch_ref/yolo_torch.py, ultralytics key layout)
    → saved as a real-key ``.pt`` →
  extract_state_dict / convert_yolo_state_dict (utils/torch_convert.py)
    → flax YOLOModel forward →
  assert decoded boxes / class probs / proto bank / mask coeffs match the torch
  forward at fp32.

This fails if ANY of the following deviates from ultralytics semantics: the
spec wiring (concat order, channel widths), the key mapping, conv/BN padding
arithmetic, the DFL/anchor decode, or the proto head.  Reference contract:
/root/reference/yolo_seg/app.py:91 (predict API on fine-tuned v8/v11-seg
checkpoints), SURVEY.md §3.4.
"""

import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.torch_ref.yolo_torch import YOLOTorch, randomize
from yolo_puncture_tpu.models.yolo import YOLOModel
from yolo_puncture_tpu.utils.torch_convert import (
    convert_yolo_state_dict,
    extract_state_dict,
)


def _parity_case(version, scale, task, nc=1, imgsz=128, seed=0):
    tm = randomize(YOLOTorch(version=version, scale=scale, nc=nc, task=task), seed=seed)

    # save as a realistic ultralytics-style .pt (module under 'model' key) and
    # round-trip through the production loader
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, f"{version}{scale}-{task}.pt")
        torch.save({"model": tm, "train_args": {"imgsz": imgsz}}, path)
        sd = extract_state_dict(path)

    assert len(sd) > 50, "loader failed to extract a real state dict"

    model = YOLOModel(version=version, scale=scale, nc=nc, task=task, dtype=jnp.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)))
    variables, report = convert_yolo_state_dict(sd, template, strict=False)

    # full-coverage conversion: every torch key consumed (minus DFL/trackers),
    # every flax leaf filled
    assert report["unmatched_torch_keys"] == [], report["unmatched_torch_keys"][:10]
    assert report["unfilled_flax_leaves"] == [], report["unfilled_flax_leaves"][:10]

    rng = np.random.default_rng(seed + 1)
    img = rng.uniform(0, 1, size=(2, imgsz, imgsz, 3)).astype(np.float32)

    with torch.no_grad():
        tout = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    jout = jax.jit(model.apply)(variables, jnp.asarray(img))

    np.testing.assert_allclose(
        np.asarray(jout["boxes"]), tout["boxes"].numpy(), rtol=2e-4, atol=5e-3,
        err_msg="decoded boxes diverge from torch reference",
    )
    np.testing.assert_allclose(
        np.asarray(jout["probs"]), tout["probs"].numpy(), rtol=1e-3, atol=1e-4,
        err_msg="class probabilities diverge from torch reference",
    )
    if task == "segment":
        # torch proto (B, nm, H, W) → NHWC
        np.testing.assert_allclose(
            np.asarray(jout["proto"]),
            tout["proto"].numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=2e-3,
            err_msg="proto bank diverges from torch reference",
        )
        np.testing.assert_allclose(
            np.asarray(jout["coeffs"]), tout["coeffs"].numpy(), rtol=1e-3, atol=2e-3,
            err_msg="mask coefficients diverge from torch reference",
        )


def test_v8n_seg_full_parity():
    """yolov8n-seg — the reference's primary fine-tuned checkpoint family."""
    _parity_case("v8", "n", "segment")


def test_v11n_seg_full_parity():
    """yolo11n-seg — reference weights seg/yolo11n-seg-finetune.pt."""
    _parity_case("v11", "n", "segment")


def test_v10n_detect_full_parity():
    """yolov10n — NMS-free one-to-one branch decode."""
    _parity_case("v10", "n", "detect")


def _reference_postprocess(tm, frame_bgr, imgsz, conf_th, iou_th, max_det=12):
    """Independent numpy implementation of the ultralytics predict postprocess
    (square letterbox → forward → conf filter → class-aware NMS → scale_boxes →
    process_mask_native retina path).  Mirrors SURVEY.md §3.4."""
    import cv2

    h0, w0 = frame_bgr.shape[:2]
    r = min(imgsz / h0, imgsz / w0)
    new_w, new_h = round(w0 * r), round(h0 * r)
    resized = cv2.resize(frame_bgr, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    dw, dh = (imgsz - new_w) / 2, (imgsz - new_h) / 2
    top, bot = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(resized, top, bot, left, right,
                             cv2.BORDER_CONSTANT, value=(114, 114, 114))
    x = img[:, :, ::-1].astype(np.float32) / 255.0
    with torch.no_grad():
        out = tm(torch.from_numpy(x.transpose(2, 0, 1)[None]))
    boxes = out["boxes"][0].numpy()
    probs = out["probs"][0].numpy()
    coeffs = out["coeffs"][0].numpy()
    protos = out["proto"][0].numpy()  # (nm, Hp, Wp)

    scores = probs.max(1)
    keep = scores > conf_th
    boxes, scores, coeffs = boxes[keep], scores[keep], coeffs[keep]
    order = np.argsort(-scores, kind="stable")
    kept = []
    for i in order:
        ok = True
        for j in kept:
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-9) > iou_th:
                ok = False
                break
        if ok:
            kept.append(i)
        if len(kept) >= max_det:
            break
    boxes, scores, coeffs = boxes[kept], scores[kept], coeffs[kept]

    # boxes → original coords
    ob = boxes.copy()
    ob[:, [0, 2]] -= dw
    ob[:, [1, 3]] -= dh
    ob /= r
    ob[:, [0, 2]] = ob[:, [0, 2]].clip(0, w0)
    ob[:, [1, 3]] = ob[:, [1, 3]].clip(0, h0)

    # masks: native (retina) path — sigmoid proto decode, remove pad at proto
    # scale, bilinear to original res, crop by box, threshold
    nm, Hp, Wp = protos.shape
    logits = coeffs @ protos.reshape(nm, -1)
    m = 1.0 / (1.0 + np.exp(-logits.reshape(-1, Hp, Wp)))
    s = Hp / imgsz  # proto scale
    y1p, y2p = int(round(top * s)), Hp - int(round(bot * s))
    x1p, x2p = int(round(left * s)), Wp - int(round(right * s))
    masks = []
    for k in range(len(m)):
        crop = m[k, y1p:y2p, x1p:x2p]
        full = cv2.resize(crop, (w0, h0), interpolation=cv2.INTER_LINEAR)
        bx = ob[k]
        yy, xx = np.mgrid[0:h0, 0:w0]
        inside = (xx >= bx[0]) & (xx < bx[2]) & (yy >= bx[1]) & (yy < bx[3])
        masks.append((full > 0.5) & inside)
    return ob, scores, (np.stack(masks) if masks else np.zeros((0, h0, w0), bool))


def test_v8n_seg_predict_e2e_parity():
    """End-to-end .predict parity on a frame: letterbox → forward → NMS →
    rescale → retina mask decode, vs the independent reference postprocess."""
    import jax.numpy as jnp

    from yolo_puncture_tpu.predict import YOLO

    tm = randomize(YOLOTorch(version="v8", scale="n", nc=1, task="segment"), seed=3)
    # shape the DFL logits toward SMALL distances with spatial variety: random
    # weights otherwise regress huge boxes that all clip to the full frame,
    # collapsing NMS into a degenerate fixture
    with torch.no_grad():
        g = torch.Generator().manual_seed(9)
        for seq in tm.model[-1].cv2:
            final = seq[2]
            final.weight.data = torch.randn(final.weight.shape, generator=g) * 0.4
            bias = torch.randn(final.bias.shape, generator=g) * 0.3
            for side in range(4):
                bias[side * 16 : (side + 1) * 16] -= 0.7 * torch.arange(16.0)
            final.bias.data = bias
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    imgsz = 256
    det = YOLO("yolov8n-seg", nc=1, dtype=jnp.float32)
    template = det.model.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)))
    variables, report = convert_yolo_state_dict(sd, template, strict=False)
    assert not report["unmatched_torch_keys"] and not report["unfilled_flax_leaves"]
    det.variables = variables

    rng = np.random.default_rng(5)
    frame = rng.integers(0, 255, size=(200, 320, 3), dtype=np.uint8)
    conf_th, iou_th = 0.3, 0.7

    r = det.predict(frame, conf=conf_th, iou=iou_th, imgsz=imgsz,
                    retina_masks=True)[0]
    ours_boxes = np.asarray(r.boxes.xyxy)
    ours_scores = np.asarray(r.boxes.conf)
    ref_boxes, ref_scores, ref_masks = _reference_postprocess(
        tm, frame, imgsz, conf_th, iou_th, max_det=len(ours_boxes) or 12
    )

    n = min(len(ours_boxes), len(ref_boxes))
    assert n >= 3, "fixture produced too few detections — raise seed variance"
    assert abs(len(ours_boxes) - len(ref_boxes)) <= 2  # NMS tie-break slack

    # set-based matching (near-equal scores may swap list order between the
    # two NMS implementations without any numerical disagreement)
    pairs, used = [], set()
    for k in range(len(ref_boxes)):
        for j in range(len(ours_boxes)):
            if j in used:
                continue
            if (abs(float(ours_scores[j]) - float(ref_scores[k])) < 1e-3
                    and np.allclose(ours_boxes[j], ref_boxes[k], atol=1.5)):
                used.add(j)
                pairs.append((j, k))
                break
    assert len(pairs) >= 0.85 * n, (
        f"only {len(pairs)}/{n} detections matched between the pipelines"
    )

    if r.masks is not None:
        ours_masks = np.asarray(r.masks.data).astype(bool)
        checked = 0
        for j, k in pairs:
            inter = (ours_masks[j] & ref_masks[k]).sum()
            union = (ours_masks[j] | ref_masks[k]).sum()
            # skip slivers: for masks of a few hundred pixels the two
            # pipelines' crop/resize ORDER (ours crops at letterbox res then
            # pastes; ultralytics resizes then crops) moves enough boundary
            # pixels to dominate IoU without any numerical disagreement
            if union >= 500:
                checked += 1
                assert inter / union > 0.9, (
                    f"pair {(j, k)} mask IoU {inter / union:.3f} "
                    "(crop/resize-order boundary drift should stay <10%)"
                )
        assert checked >= 3, "too few substantial masks compared"


@pytest.mark.slow
def test_v10s_seg_full_parity():
    """YOLOv10-S seg — the BASELINE flagship configuration."""
    _parity_case("v10", "s", "segment", imgsz=96)


@pytest.mark.slow
def test_v11m_detect_full_parity():
    """yolo11m — exercises the C3k force-flip and C2PSA at m-scale widths."""
    _parity_case("v11", "m", "detect", imgsz=64)
