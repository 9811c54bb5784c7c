"""INT8 serving paths: conv interceptor fidelity + predictor integration."""

import jax
import jax.numpy as jnp
import numpy as np


def test_int8_convbn_close_to_fp():
    from yolo_puncture_tpu.nn.common import ConvBN
    from yolo_puncture_tpu.nn.quant import int8_convs

    m = ConvBN(32, 3, 2)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 16)).astype(np.float32)
    )
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x))
    with int8_convs():
        got = np.asarray(m.apply(v, x))
    assert np.corrcoef(ref.ravel(), got.ravel())[0, 1] > 0.999
    assert np.abs(ref - got).max() < 0.1


def test_int8_skips_biased_and_grouped_convs():
    """Prediction-layer convs (use_bias=True) and depthwise convs keep exact
    fp outputs under the interceptor."""
    from flax import linen as nn
    from yolo_puncture_tpu.nn.quant import int8_convs

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            a = nn.Conv(8, (1, 1), use_bias=True, padding=[(0, 0), (0, 0)], name="pred")(x)
            b = nn.Conv(
                x.shape[-1], (3, 3), feature_group_count=x.shape[-1],
                use_bias=False, padding=[(1, 1), (1, 1)], name="dw",
            )(x)
            return a, b

    m = M()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 8)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    ra, rb = m.apply(v, x)
    with int8_convs():
        ga, gb = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(ra))
    np.testing.assert_array_equal(np.asarray(gb), np.asarray(rb))


def test_int8_model_forward_tracks_fp():
    from yolo_puncture_tpu.models.yolo import YOLOModel
    from yolo_puncture_tpu.nn.quant import int8_convs

    model = YOLOModel(version="v10", scale="n", nc=1, task="segment")
    v = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32))
    x = jnp.asarray(
        np.random.default_rng(1).uniform(size=(1, 128, 128, 3)).astype(np.float32)
    )
    ref = model.apply(v, x)
    with int8_convs():
        got = model.apply(v, x)
    for k in ("boxes", "probs"):
        r, g = np.asarray(ref[k]).ravel(), np.asarray(got[k]).ravel()
        assert np.isfinite(g).all()
        assert np.corrcoef(r, g)[0, 1] > 0.99, k


def test_int8_predictor_end_to_end():
    from yolo_puncture_tpu.predict import YOLO

    frame = np.random.default_rng(2).integers(0, 255, (96, 128, 3), np.uint8)
    fp = YOLO("yolov8n-seg", nc=1, max_det=8, max_masks=4)
    q8 = YOLO("yolov8n-seg", nc=1, max_det=8, max_masks=4, int8_serving=True)
    q8.variables = fp.variables
    r_fp = fp.predict(source=frame, conf=0.0, imgsz=64, iou=1.0)[0]
    r_q8 = q8.predict(source=frame, conf=0.0, imgsz=64, iou=1.0)[0]
    assert len(r_q8.boxes) == len(r_fp.boxes)
    # int8 perturbs scores slightly; box geometry stays close
    np.testing.assert_allclose(
        np.sort(r_q8.boxes.xyxy, axis=0), np.sort(r_fp.boxes.xyxy, axis=0), atol=6.0
    )


def test_collect_act_scales_static_matches_dynamic():
    """percentile=100 scales from the SAME batch reproduce the dynamic path
    (static sx == dynamic absmax scale)."""
    from yolo_puncture_tpu.nn.common import ConvBN
    from yolo_puncture_tpu.nn.quant import collect_act_scales, int8_convs

    m = ConvBN(16, 3, 1)
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 16, 16, 8)).astype(np.float32)
    )
    v = m.init(jax.random.PRNGKey(0), x)
    scales = collect_act_scales(lambda b: m.apply(v, b), [x], percentile=100.0)
    assert len(scales) == 1 and all(s > 0 for s in scales.values())
    with int8_convs():
        dyn = np.asarray(m.apply(v, x))
    with int8_convs(act_scales=scales):
        stat = np.asarray(m.apply(v, x))
    np.testing.assert_allclose(stat, dyn, rtol=1e-5, atol=1e-5)


def test_calibrated_predictor_end_to_end():
    from yolo_puncture_tpu.predict import YOLO

    det = YOLO("yolo10n-seg", nc=1, max_det=8, max_masks=4, int8_serving=True)
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(2)]
    scales = det.calibrate_int8(frames, imgsz=64)
    assert len(scales) > 20  # every backbone/neck ConvBN conv recorded
    assert all(s >= 0 for s in scales.values())
    r = det.predict(source=frames[0], conf=0.25, imgsz=64)[0]
    assert r.boxes.xyxy.shape[1] == 4  # full Results surface under static int8
