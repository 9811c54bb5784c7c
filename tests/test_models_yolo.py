"""YOLO family: shapes, param counts, jit-compilability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_puncture_tpu import create_model


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def init_model(name, nc=80, img=128):
    model = create_model(name, nc=nc)
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


@pytest.mark.parametrize(
    "name,lo,hi",
    [
        # published: yolov8n 3.2M / v8n-seg 3.4M (ultralytics), yolov10n 2.3M
        # (BASELINE.md README.md:48), yolo11n 2.6M / 11n-seg 2.9M.
        ("yolov8n", 2.6e6, 3.8e6),
        ("yolov8n-seg", 2.8e6, 4.0e6),
        ("yolo10n", 2.0e6, 3.2e6),
        ("yolo11n", 2.2e6, 3.2e6),
        ("yolo11n-seg", 2.5e6, 3.5e6),
    ],
)
def test_param_counts(name, lo, hi):
    # eval_shape: param shapes without any compute/compile
    from yolo_puncture_tpu import create_model as cm

    model = cm(name, nc=80)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    n = n_params(shapes["params"])
    assert lo < n < hi, f"{name}: {n} params outside [{lo}, {hi}]"


@pytest.mark.parametrize("name", ["yolov8n-seg", "yolo10n-seg", "yolo11n-seg"])
def test_segment_forward_shapes(name):
    model, variables, x = init_model(name, nc=1, img=128)
    out = model.apply(variables, x)
    A = (128 // 8) ** 2 + (128 // 16) ** 2 + (128 // 32) ** 2
    assert out["boxes"].shape == (1, A, 4)
    assert out["probs"].shape == (1, A, 1)
    assert out["coeffs"].shape == (1, A, 32)
    assert out["proto"].shape[0:3] == (1, 32, 32)  # H/4, W/4
    assert np.all(np.isfinite(np.asarray(out["boxes"])))
    # probs are sigmoid outputs
    p = np.asarray(out["probs"])
    assert p.min() >= 0 and p.max() <= 1


def test_v10_has_one2one_branch():
    model, variables, x = init_model("yolo10n", nc=1, img=64)
    out = model.apply(variables, x)
    assert "one2one_box_feats" in out
    assert len(out["one2one_box_feats"]) == 3


def test_jit_compiles_and_is_deterministic():
    model, variables, x = init_model("yolov8n-seg", nc=1, img=64)
    fwd = jax.jit(lambda v, im: model.apply(v, im))
    a = fwd(variables, x)
    b = fwd(variables, x)
    np.testing.assert_array_equal(np.asarray(a["boxes"]), np.asarray(b["boxes"]))


def test_batch_dimension():
    model, variables, _ = init_model("yolo10s-seg", nc=1, img=64)
    x = jnp.zeros((3, 64, 64, 3), jnp.float32)
    out = model.apply(variables, x)
    assert out["boxes"].shape[0] == 3
