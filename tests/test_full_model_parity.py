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


@pytest.mark.slow
def test_v10s_seg_full_parity():
    """YOLOv10-S seg — the BASELINE flagship configuration."""
    _parity_case("v10", "s", "segment", imgsz=96)


@pytest.mark.slow
def test_v11m_detect_full_parity():
    """yolo11m — exercises the C3k force-flip and C2PSA at m-scale widths."""
    _parity_case("v11", "m", "detect", imgsz=64)
