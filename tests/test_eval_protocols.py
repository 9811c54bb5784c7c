"""Units for the evaluation-protocol tooling (tools/eval_tracker_quality.py):
the r4 serving-scale clip generator, GT→predicted-id matching, and the
detector conf adapter.  The full protocols run on-chip; these pin the
host-side mechanics that the on-chip runs depend on."""

import numpy as np
import pytest

from tools.eval_tracker_quality import (
    _ConfAdapter,
    _iou,
    _match_ids,
    make_realistic_clip,
    make_serving_video,
)


def test_make_serving_video_shapes_and_motion():
    rng = np.random.default_rng(3)
    frames, masks = make_serving_video(rng, T=24, size=128, n_needles=2)
    assert frames.shape == (24, 128, 128, 3) and frames.dtype == np.uint8
    assert masks.shape == (24, 2, 128, 128)
    # every needle visible every frame, and object 0 shrinks (insertion)
    areas0 = masks[:, 0].sum((1, 2))
    assert (masks.sum((2, 3)) > 0).all()
    assert areas0[-1] < areas0[0]


def test_make_serving_video_disappear_and_occluder():
    rng = np.random.default_rng(4)
    frames, masks = make_serving_video(rng, T=10, size=128, n_needles=2,
                                       disappear_at=5)
    assert (masks[:5, 0].sum((1, 2)) > 0).all()
    assert (masks[5:, 0] == 0).all()          # withdrawn needle has empty GT
    assert (masks[5:, 1].sum((1, 2)) > 0).all()  # the other keeps going

    frames, masks = make_serving_video(rng, T=10, size=128, occluder=True)
    # the occluder must actually hide the needle at some point mid-clip
    areas = masks[:, 0].sum((1, 2))
    assert areas.min() < 0.7 * areas.max()


def test_match_ids_greedy_assignment():
    # GT object 0 ↔ pred id 2, GT object 1 ↔ pred id 1, across 3 frames
    T, H, W = 4, 16, 16
    masks = np.zeros((T, 2, H, W), np.float32)
    pred = {}
    for t in range(1, T):
        ids = np.zeros((H, W), np.int32)
        ids[2:6, 2:6] = 2     # matches GT 0
        ids[10:14, 10:14] = 1  # matches GT 1
        pred[t] = ids
        masks[t, 0, 2:6, 2:6] = 1
        masks[t, 1, 10:14, 10:14] = 1
    assigned = _match_ids(pred, masks, K=2, T=T)
    assert assigned == {0: 2, 1: 1}


def test_conf_adapter_overrides_and_counts():
    class FakeDet:
        def __init__(self):
            self.seen = []

        def predict(self, image, **kw):
            self.seen.append(kw)

            class R:
                masks = None
                boxes = None

            return [R()]

    fake = FakeDet()
    ad = _ConfAdapter(fake, conf=0.37, imgsz=320)
    ad.predict(np.zeros((8, 8, 3), np.uint8), conf=0.9, imgsz=640)
    assert fake.seen[0]["conf"] == 0.37 and fake.seen[0]["imgsz"] == 320
    assert ad.calls == 1 and ad.hits == 0


def test_realistic_clip_multiobject_gt_disjoint():
    rng = np.random.default_rng(5)
    _, masks = make_realistic_clip(rng, 6, 64, 96, n_objects=2, occluder=True)
    assert masks.shape == (6, 2, 64, 96)
    # visible-region GT: the two objects never share a pixel
    assert (masks.sum(1) <= 1.0).all()


def test_iou_nan_on_empty_union():
    assert np.isnan(_iou(np.zeros((4, 4), bool), np.zeros((4, 4), bool)))
    assert _iou(np.ones((2, 2), bool), np.ones((2, 2), bool)) == 1.0
