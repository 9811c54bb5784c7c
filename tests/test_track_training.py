"""Propagation-network training: loss drops, propagation IoU improves."""

import numpy as np
import pytest


@pytest.mark.slow
def test_propagation_training_improves_iou():
    from yolo_puncture_tpu.track import TrackerCore
    from yolo_puncture_tpu.track.train import PropagationTrainer

    core = TrackerCore(
        image_size=(48, 64), max_objects=2, mem_frames=2, mem_every=1,
        enable_long_term=False,
    )
    # the slim net (value_dim 128 / 128-64 decoder) needs batched gradients to
    # learn at this toy scale; single-clip batches plateau (probed: bs=1 lr=1e-3
    # stalls at loss≈1, bs=8 reaches loss 0.03 / IoU 0.48 in 150 steps)
    tr = PropagationTrainer(core, lr=1e-3, clip_len=3, batch_size=8)
    iou0 = tr.eval_propagation_iou(4)
    loss = tr.fit(steps=150, log_every=0)
    iou1 = tr.eval_propagation_iou(4)
    assert loss < 0.3, f"loss did not converge: {loss}"
    assert iou1 > max(1.5 * iou0, 0.25), f"IoU {iou0:.3f} → {iou1:.3f}: no improvement"


def test_synthetic_clip_shapes():
    from yolo_puncture_tpu.track.train import make_synthetic_clip

    rng = np.random.default_rng(0)
    imgs, masks = make_synthetic_clip(rng, T=5, h=32, w=48, max_objects=3)
    assert imgs.shape == (5, 32, 48, 3)
    assert masks.shape == (5, 3, 32, 48)
    assert imgs.min() >= 0 and imgs.max() <= 1
    assert masks[0].sum() > 0  # at least one object


def test_windowed_loss_finite_and_differentiable():
    """build_windowed_propagation_loss: rollout through propagate_window gives
    a finite loss and nonzero grads (exposure consistency for the batched
    serving path)."""
    import jax
    import jax.numpy as jnp

    from yolo_puncture_tpu.track.core import TrackerCore
    from yolo_puncture_tpu.track.train import (
        build_windowed_propagation_loss,
        make_synthetic_clip,
    )

    core = TrackerCore(image_size=(32, 48), max_objects=2, mem_frames=4,
                       mem_every=2, enable_long_term=False)
    loss_fn = build_windowed_propagation_loss(core, window=2)
    rng = np.random.default_rng(0)
    images, masks = make_synthetic_clip(rng, T=5, h=32, w=48, max_objects=2)
    obj_valid = (masks.sum((0, 2, 3)) > 0).astype(np.float32)
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
        core.variables, jnp.asarray(images), jnp.asarray(masks),
        jnp.asarray(obj_valid),
    )
    assert np.isfinite(float(loss))
    gnorm = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["params"])
    )
    assert gnorm > 0, "windowed rollout produced zero gradients"


def test_trainer_window_mix_validation():
    from yolo_puncture_tpu.track.core import TrackerCore
    from yolo_puncture_tpu.track.train import PropagationTrainer

    core = TrackerCore(image_size=(32, 48), max_objects=2, mem_frames=4,
                       mem_every=2, enable_long_term=False)
    with pytest.raises(ValueError, match="multiple of"):
        PropagationTrainer(core, clip_len=4, window_mix=0.5, window=4)


def test_domain_randomized_clip_contract():
    """Same (images, onehot) contract as make_synthetic_clip, plus occlusion
    exclusivity: later-painted objects own the overlap pixels."""
    from yolo_puncture_tpu.track.train import make_domain_randomized_clip

    rng = np.random.default_rng(1)
    for _ in range(6):  # sample across background/object modes
        imgs, masks = make_domain_randomized_clip(rng, T=4, h=32, w=48, max_objects=3)
        assert imgs.shape == (4, 32, 48, 3)
        assert masks.shape == (4, 3, 32, 48)
        assert imgs.dtype == np.float32 and masks.dtype == np.float32
        assert imgs.min() >= 0 and imgs.max() <= 1
        assert masks[0].sum() > 0
        # exclusive masks: no pixel belongs to two objects
        assert masks.sum(axis=1).max() <= 1.0 + 1e-6


@pytest.mark.parametrize("scale", ["n", "s"])
def test_pyramid_channels_match_backbone(scale):
    """pyramid_channels_for must report the channels the real backbone emits —
    the PyramidAdapter's projections are initialized from it (the CLI passes it
    to TrackerCore for any --detector_scale)."""
    import jax
    import jax.numpy as jnp

    from yolo_puncture_tpu.models.yolo import YOLOModel
    from yolo_puncture_tpu.track.train import pyramid_channels_for

    model = YOLOModel(version="v10", scale=scale, nc=1, task="segment")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x),
        variables, jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32),
    )
    pyr = out["pyramid"]
    got = (pyr["P3"].shape[-1], pyr["P4"].shape[-1], pyr["P5"].shape[-1])
    assert got == pyramid_channels_for("v10", scale)


@pytest.mark.slow
def test_shared_backbone_training_loss_drops():
    """Shared-backbone mode: PyramidAdapter + decoder learn against a frozen
    YOLO backbone pyramid (the fused-pipeline configuration)."""
    from yolo_puncture_tpu.track import TrackerCore
    from yolo_puncture_tpu.track.train import (
        PropagationTrainer,
        make_yolo_pyramid_fn,
        pyramid_channels_for,
    )

    core = TrackerCore(
        image_size=(48, 96), max_objects=2, mem_frames=2, mem_every=1,
        enable_long_term=False, pyramid_adapter=True,
        pyramid_channels=pyramid_channels_for("v10", "n"),
    )
    pyramid_fn, _ = make_yolo_pyramid_fn(scale="n", seed=0)
    tr = PropagationTrainer(core, lr=1e-3, clip_len=3, batch_size=4,
                            pyramid_fn=pyramid_fn)
    losses = []
    for _ in range(3):
        losses.append(tr.fit(steps=10, log_every=0))
    iou = tr.eval_propagation_iou(2)
    assert losses[-1] < losses[0], f"loss not dropping: {losses}"
    assert np.isfinite(losses[-1])
