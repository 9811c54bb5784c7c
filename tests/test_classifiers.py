"""EfficientNet / VAN / U2Net: shapes, param counts, task-API contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_puncture_tpu import create_model


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def test_efficientnet_b3_param_count():
    # timm efficientnet_b3 (nc=2): ~10.7M params
    model = create_model("efficientnet_b3", num_classes=2)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    n = n_params(shapes["params"])
    assert 9.5e6 < n < 12.5e6, n


def test_efficientnet_forward_softmax_contract():
    model = create_model("efficientnet_b0", num_classes=2)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(v, x)
    assert logits.shape == (2, 2)
    p = jax.nn.softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, rtol=1e-5)


def test_van_b0_param_count():
    # published VAN-B0 ≈ 4.1M at 1000 classes → 3.85M at num_classes=2 (the
    # 256-dim head loses ~255k).  Tight band pins the per-stage mlp_ratios
    # [8, 8, 4, 4] — a constant ratio 4 would drop ~300k params silently.
    model = create_model("van_b0", num_classes=2)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    n = n_params(shapes["params"])
    assert abs(n - 3_849_314) / 3_849_314 < 0.005, n


def test_van_forward():
    model = create_model("van_b0", num_classes=2)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(v, x).shape == (1, 2)


def test_u2netp_param_count_and_outputs():
    # U2NETP ≈ 1.13M params (“4.7 MB” fp32, unet_segment.py:37)
    model = create_model("u2netp")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    n = n_params(shapes["params"])
    assert 0.9e6 < n < 1.4e6, n
    v = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(v, x)
    assert len(outs) == 7  # d0..d6 (7-output contract, unet_segment.py:59)
    for d in outs:
        assert d.shape == (1, 64, 64, 1)
        vals = np.asarray(d)
        assert vals.min() >= 0 and vals.max() <= 1  # sigmoid outputs


def test_u2net_full_param_count():
    # full U2NET ≈ 44M params (“173.6 MB”, unet_segment.py:34)
    model = create_model("u2net")
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )
    n = n_params(shapes["params"])
    assert 40e6 < n < 48e6, n


def test_unet_predict_contract():
    from yolo_puncture_tpu.tasks import load_unet, unet_predict

    net = load_unet("u2netp")
    img = np.random.default_rng(0).integers(0, 255, (64, 48, 3), np.uint8)
    mask = unet_predict(net, img)
    assert mask.shape == (64, 48)
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)).issubset({0, 255})


def test_classifier_task_api():
    from yolo_puncture_tpu.tasks import ClassifierNet, predict_and_find_start_inserted

    net = ClassifierNet("efficientnet_b0", input_size=96)
    frames = [
        np.random.default_rng(i).integers(0, 255, (120, 160, 3), np.uint8)
        for i in range(8)
    ]
    boxes = [[40, 30, 120, 90]] * 8
    classes, probs, idx = predict_and_find_start_inserted(
        net, frames=frames, boxes_list=boxes, judge_wnd=5, batch_size=4
    )
    assert len(classes) == len(probs) == 8
    assert 0 <= idx < 8
    # post-repair monotonicity: 0s then 1s
    assert all(c == 0 for c in classes[:idx])
    assert all(c == 1 for c in classes[idx + 1 :])


def test_crop_frame_contract():
    from yolo_puncture_tpu.utils.transform import crop_frame

    frame = np.arange(100 * 120 * 3, dtype=np.uint8).reshape(100, 120, 3)
    crop, (x1, y1, x2, y2) = crop_frame(frame, [50, 40, 70, 60], crop_size=40)
    assert (x2 - x1, y2 - y1) == (40, 40)
    assert crop.shape == (40, 40, 3)
    # corner box: clamped and zero-padded to crop_size
    crop2, coords2 = crop_frame(frame, [0, 0, 10, 10], crop_size=40, need_padding=True)
    assert crop2.shape == (40, 40, 3)
    assert crop2[30:, :].sum() == 0  # bottom padding rows are zeros
