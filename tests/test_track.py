"""Temporal propagation engine: step / incorporate / voting / saver contracts."""

import numpy as np
import pytest

from yolo_puncture_tpu.track import (
    FrameInfo,
    ObjectInfo,
    ResultSaver,
    TrackerCore,
    flush_buffer,
    get_input_frame_for_deva,
)


@pytest.fixture(scope="module")
def tracker():
    return TrackerCore(image_size=(64, 96), max_objects=4, mem_frames=4, mem_every=2)


def _frame(seed=0, h=64, w=96):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), np.uint8)


def _disk_mask(h=64, w=96, cy=32, cx=40, r=12):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r).astype(np.int32)


def test_step_before_any_detection_is_background():
    # fresh core, NOT the shared module fixture: later tests incorporate
    # objects into the fixture, and this test's "nothing tracked" assertion
    # must not depend on execution order
    tracker = TrackerCore(image_size=(64, 96), max_objects=4, mem_frames=4, mem_every=2)
    prob = tracker.step(_frame(0))
    assert prob.shape == (5, 64, 96)  # bg + max_objects
    np.testing.assert_allclose(prob.sum(0), 1.0, atol=1e-4)
    assert np.argmax(prob, 0).max() == 0  # nothing tracked yet


def test_incorporate_then_propagate(tracker):
    mask = _disk_mask()
    prob = tracker.incorporate_detection(
        _frame(1), mask, [ObjectInfo(id=7, score=0.9, category_id=0)]
    )
    ids = np.argmax(prob, 0)
    # object occupies slot 0 → channel 1
    inside = ids[32, 40]
    assert inside == 1
    assert tracker.object_manager.slot_to_info[0].id == 7
    # propagation keeps memory engaged
    prob2 = tracker.step(_frame(2))
    assert prob2.shape == (5, 64, 96)
    assert tracker.memory_engaged


def test_match_detections_merges_and_allocates():
    """Pure matcher: overlap > 0.5 merges into the existing slot, a disjoint
    detection claims the first free slot (incremental semantics)."""
    import jax.numpy as jnp
    from yolo_puncture_tpu.track.core import match_detections

    No, H, W = 4, 32, 48
    prop = np.zeros((No, H, W), np.float32)
    prop[0, 8:24, 8:24] = 1  # existing object in slot 0
    active = np.array([True, False, False, False])

    det = np.zeros((No, H, W), np.float32)
    det[0, 9:25, 9:25] = 1       # ≈0.77 IoU with slot 0 → merge
    det[1, 2:8, 36:44] = 1       # disjoint → new slot
    det_valid = np.array([True, True, False, False])

    merged, new_active, det_to_slot = match_detections(
        jnp.asarray(prop), jnp.asarray(active), jnp.asarray(det), jnp.asarray(det_valid)
    )
    det_to_slot = np.asarray(det_to_slot)
    assert det_to_slot[0] == 0           # merged into existing identity
    assert det_to_slot[1] == 1           # allocated first free slot
    assert det_to_slot[2] == -1          # invalid detection unassigned
    new_active = np.asarray(new_active)
    assert new_active[:2].all() and not new_active[2:].any()
    np.testing.assert_array_equal(np.asarray(merged)[0], det[0])  # detection wins


def test_match_detections_slots_exhausted():
    import jax.numpy as jnp
    from yolo_puncture_tpu.track.core import match_detections

    No, H, W = 2, 16, 16
    prop = np.zeros((No, H, W), np.float32)
    active = np.array([True, True])  # all slots taken, no overlap with dets
    det = np.zeros((No, H, W), np.float32)
    det[0, :4, :4] = 1
    det_valid = np.array([True, False])
    _, new_active, det_to_slot = match_detections(
        jnp.asarray(prop), jnp.asarray(active), jnp.asarray(det), jnp.asarray(det_valid)
    )
    assert int(np.asarray(det_to_slot)[0]) == -1  # dropped: no free slot, no match


def test_match_detections_one_det_per_slot():
    """A later (lower-conf) detection cannot overwrite a slot already claimed
    this call — nor spawn a near-identical duplicate slot (VERDICT r4 item 1)."""
    import jax.numpy as jnp
    from yolo_puncture_tpu.track.core import match_detections

    No, H, W = 4, 32, 48
    prop = np.zeros((No, H, W), np.float32)
    prop[0, 8:24, 8:24] = 1
    active = np.array([True, False, False, False])
    det = np.zeros((No, H, W), np.float32)
    det[0, 8:24, 8:24] = 1   # exact match → claims slot 0
    det[1, 9:25, 9:25] = 1   # duplicate of det 0 (containment ≈ 0.88) → dropped
    det_valid = np.array([True, True, False, False])
    merged, act, det_to_slot = match_detections(
        jnp.asarray(prop), jnp.asarray(active), jnp.asarray(det),
        jnp.asarray(det_valid),
    )
    det_to_slot = np.asarray(det_to_slot)
    assert det_to_slot[0] == 0
    assert det_to_slot[1] == -1          # suppressed, not spawned
    assert np.asarray(act).sum() == 1    # no ghost slot


def test_match_detections_coverage_merge_through_dip():
    """A shrunken propagated remnant covered by the detection merges (IoU may
    be < 0.5 during a propagation-quality dip) instead of spawning."""
    import jax.numpy as jnp
    from yolo_puncture_tpu.track.core import match_detections

    No, H, W = 4, 32, 48
    prop = np.zeros((No, H, W), np.float32)
    prop[0, 12:18, 12:18] = 1            # remnant: 36 px
    active = np.array([True, False, False, False])
    det = np.zeros((No, H, W), np.float32)
    det[0, 8:24, 8:24] = 1               # full object: 256 px → IoU 0.14
    det_valid = np.array([True, False, False, False])
    merged, act, det_to_slot = match_detections(
        jnp.asarray(prop), jnp.asarray(active), jnp.asarray(det),
        jnp.asarray(det_valid),
    )
    assert int(np.asarray(det_to_slot)[0]) == 0  # merged, same identity
    assert np.asarray(act).sum() == 1


def test_match_detections_ghost_kill():
    """An active slot no detection claimed, whose mask is covered by a mask a
    detection DID claim, is deactivated (two-slots-one-object churn killer)."""
    import jax.numpy as jnp
    from yolo_puncture_tpu.track.core import match_detections

    No, H, W = 4, 32, 48
    prop = np.zeros((No, H, W), np.float32)
    prop[0, 8:24, 8:24] = 1              # established object
    prop[1, 9:23, 9:23] = 1              # ghost duplicate of the same object
    active = np.array([True, True, False, False])
    det = np.zeros((No, H, W), np.float32)
    det[0, 8:24, 8:24] = 1               # one detection for the one object
    det_valid = np.array([True, False, False, False])
    merged, act, det_to_slot = match_detections(
        jnp.asarray(prop), jnp.asarray(active), jnp.asarray(det),
        jnp.asarray(det_valid),
    )
    act = np.asarray(act)
    assert int(np.asarray(det_to_slot)[0]) == 0
    assert act[0] and not act[1]         # ghost slot deactivated
    assert np.asarray(merged)[1].sum() == 0


def test_incorporate_spawn_gets_fresh_external_id():
    """Incoming segment ids are 1..n per auto_segment call; a spawned second
    object must get a FRESH global id, not collide with an established one."""
    t = TrackerCore(image_size=(64, 96), max_objects=4, mem_frames=4, mem_every=2)
    t.incorporate_detection(_frame(0), _disk_mask(), [ObjectInfo(id=1)])
    far = _disk_mask(cy=10, cx=80, r=6)
    t.incorporate_detection(_frame(1), far * 2, [ObjectInfo(id=1), ObjectInfo(id=1)])
    ids = [o.id for o in t.object_manager.slot_to_info.values()]
    assert len(ids) == len(set(ids)), f"duplicate external ids: {ids}"


def test_incorporate_new_object_allocates_slot(tracker):
    far = _disk_mask(cy=10, cx=80, r=6)
    tracker.incorporate_detection(_frame(4), far, [ObjectInfo(id=55)])
    active = np.asarray(tracker.memory.active)
    assert active.sum() >= 1  # structural: at least one slot in use
    assert 55 in [o.id for o in tracker.object_manager.slot_to_info.values()]


def test_object_deletion_after_missed_detections():
    """DEVA max_missed_detection_count: an object unmatched by detections for N
    consecutive incorporate calls frees its slot and purges its memory."""
    t = TrackerCore(
        image_size=(64, 96), max_objects=2, mem_frames=4, mem_every=2,
        config={"max_missed_detection_count": 2},
    )
    t.incorporate_detection(_frame(0), _disk_mask(), [ObjectInfo(id=1)])
    assert 0 in t.object_manager.slot_to_info
    # two detector passes that find nothing → 2 consecutive misses → deletion
    empty = np.zeros((64, 96), np.int32)
    t.incorporate_detection(_frame(1), empty, [])
    t.incorporate_detection(_frame(2), empty, [])
    assert t.object_manager.slot_to_info == {}
    assert not np.asarray(t.memory.active).any()
    # the released slot's memory is purged (no stale readout on slot reuse)
    assert np.asarray(t.memory.values)[0].sum() == 0
    assert np.asarray(t.memory.sensory)[0].sum() == 0
    # the freed slot is reusable by a new object
    t.incorporate_detection(_frame(3), _disk_mask(), [ObjectInfo(id=9)])
    assert 9 in [o.id for o in t.object_manager.slot_to_info.values()]


def test_long_term_bank_capacity_validated():
    with pytest.raises(ValueError):
        TrackerCore(
            image_size=(64, 96), max_objects=2, mem_frames=4,
            config={"num_prototypes": 24, "max_long_term_elements": 16},
        )


def test_step_batch_empty_shape(tracker):
    out = tracker.step_batch([])
    assert out.shape == (0, 5, 64, 96)


def test_reference_tracker_geometry():
    """DEVA min-side-480 aspect-preserving geometry, /16-padded (the bench
    tracker stage must do the reference's work, not a smaller square's)."""
    from yolo_puncture_tpu.track import reference_tracker_geometry

    assert reference_tracker_geometry((720, 1280)) == (480, 864)
    assert reference_tracker_geometry((1280, 720)) == (864, 480)
    assert reference_tracker_geometry((480, 480)) == (480, 480)
    assert reference_tracker_geometry((1080, 1920)) == (480, 864)


def test_resize_src_window_equals_crop_then_resize():
    """content_box sampling == explicit crop + resize when the window lands on
    pixel boundaries (the fused crop is exact, not approximate)."""
    import jax.numpy as jnp
    from yolo_puncture_tpu.track.network import resize_bilinear_nhwc

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 24, 3)).astype(np.float32))
    win = ((0.25, 0.75), (0.0, 1.0))  # rows [4, 12) of 16
    got = resize_bilinear_nhwc(x, 8, 12, win)
    want = resize_bilinear_nhwc(x[:, 4:12], 8, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_voting_buffer():
    t = TrackerCore(image_size=(64, 96), max_objects=4, mem_frames=4)
    m1 = _disk_mask()
    m2 = _disk_mask(cx=41)
    m3 = np.zeros_like(m1)  # object missing in one frame
    for i, m in enumerate([m1, m2, m3]):
        t.add_to_temporary_buffer(
            FrameInfo(_frame(i), m, [ObjectInfo(id=1)], i, {"frame": [f"f{i}.jpg"], "shape": [64, 96]})
        )
    ti, mask, infos = t.vote_in_temporary_buffer("first")
    assert ti == 0
    assert len(infos) == 1  # seen in 2/3 frames ≥ majority
    assert (mask == 1).sum() > 0
    t.clear_buffer()
    assert t.frame_buffer == []


def test_voting_rejects_flicker():
    t = TrackerCore(image_size=(64, 96), max_objects=4, mem_frames=4)
    m1 = _disk_mask()
    empty = np.zeros_like(m1)
    for i, m in enumerate([m1, empty, empty]):
        t.add_to_temporary_buffer(
            FrameInfo(_frame(i), m, [ObjectInfo(id=1)], i, {"frame": [f"f{i}.jpg"], "shape": [64, 96]})
        )
    _, mask, infos = t.vote_in_temporary_buffer("first")
    assert len(infos) == 0 and mask.max() == 0


def test_result_saver_and_flush(tmp_path):
    t = TrackerCore(image_size=(64, 96), max_objects=4, mem_frames=4)
    saver = ResultSaver(str(tmp_path), "vid1", object_manager=t.object_manager)
    prob = t.incorporate_detection(_frame(0), _disk_mask(), [ObjectInfo(id=3)])
    saver.save_mask(prob, "0frame_0.jpg", need_resize=True, shape=(128, 192))
    assert (tmp_path / "Annotations" / "vid1" / "0frame_0.png").exists()
    ann = saver.video_json["annotations"][0]
    assert ann["file_name"] == "0frame_0.jpg"
    assert ann["segments_info"][0]["id"] == 3

    t.add_to_temporary_buffer(
        FrameInfo(_frame(1), None, None, 1, {"frame": ["0frame_1.jpg"], "shape": [64, 96]})
    )
    flush_buffer(t, saver)
    assert t.frame_buffer == []
    assert len(saver.video_json["annotations"]) == 2


def test_get_input_frame_min_side():
    img = np.zeros((100, 200, 3), np.uint8)
    out = get_input_frame_for_deva(img, 50)
    assert min(out.shape[:2]) == 50
    assert get_input_frame_for_deva(img, -1).shape == img.shape


def test_windowed_propagation_quality():
    """propagate_window (batched readout/decode + deep-update-at-write) tracks
    about as well as the exact per-frame sequential scan on the shipped
    checkpoint — the deviation the bench/batch paths rely on."""
    import os

    import jax
    import jax.numpy as jnp

    from yolo_puncture_tpu.track.core import TrackerCore
    from yolo_puncture_tpu.track.network import PropagationNetwork
    from yolo_puncture_tpu.track.train import make_synthetic_clip

    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "resources", "weights",
        "tracker_propagation.msgpack",
    )
    if not os.path.exists(ckpt):
        pytest.skip("shipped tracker checkpoint not present")
    h, w, W = 64, 96, 4
    core = TrackerCore(
        image_size=(h, w), max_objects=4, mem_frames=4, mem_every=W,
        variables=ckpt,
    )

    @jax.jit
    def window_step(variables, memory, images_w):
        keys, skips = core.net.apply(
            variables, images_w, method=PropagationNetwork.encode_key
        )
        return core.propagate_window(variables, memory, keys, skips)

    def run_clip(images, masks, windowed):
        obj_valid = masks.sum((0, 2, 3)) > 0
        prob, mem, _ = core._jit_incorporate(
            core.variables, core.memory, jnp.asarray(images[0]),
            jnp.asarray(masks[0]), jnp.asarray(obj_valid),
        )
        T = images.shape[0]
        ious = []

        def iou_at(pred_ids, t):
            for o in range(4):
                if not obj_valid[o]:
                    continue
                p = pred_ids == (o + 1)
                g = masks[t, o] > 0.5
                u = (p | g).sum()
                if u:
                    ious.append((p & g).sum() / u)

        if windowed:
            for t0 in range(1, T, W):
                probs, mem = window_step(
                    core.variables, mem, jnp.asarray(images[t0 : t0 + W])
                )
                ids = np.asarray(jnp.argmax(probs, axis=1))  # (W, h/4, w/4) s4
                for i in range(W):
                    up = ids[i].repeat(4, 0).repeat(4, 1)
                    iou_at(up, t0 + i)
        else:
            for t in range(1, T):
                prob, mem = core._jit_step(core.variables, mem, jnp.asarray(images[t]))
                iou_at(np.asarray(jnp.argmax(prob, 0)), t)
        return float(np.mean(ious)) if ious else 0.0

    rng = np.random.default_rng(3)
    seq_ious, win_ious = [], []
    for _ in range(3):
        images, masks = make_synthetic_clip(rng, T=1 + 2 * W, h=h, w=w, max_objects=4)
        seq_ious.append(run_clip(images, masks, windowed=False))
        win_ious.append(run_clip(images, masks, windowed=True))
    seq, win = np.mean(seq_ious), np.mean(win_ious)
    assert win > 0.25, f"windowed propagation broken: IoU {win:.3f}"
    # RATIO bound, not a fixed gap: the windowed path approximates the
    # sequential scan, and its absolute gap grows as the sequential tracker
    # itself sharpens (bars-only ckpt: 0.63/0.66≈0.96; round-2 DR window-mix
    # ckpts: 0.79-0.84 on this 4-object protocol even as BOTH paths improve —
    # shipped TPU-trained ckpt: win 0.70 / seq 0.88, the best absolute
    # windowed quality of any checkpoint).  A fixed-gap pin would punish
    # improving seq.  docs/tracker_quality.md flags the windowed knob; the
    # per-frame step() API remains the exactness-first option.
    assert win >= 0.72 * seq, f"windowed much worse than sequential: {win:.3f} vs {seq:.3f}"


def test_step_batch_contract(tracker):
    """step_batch: full-res probs per frame, pad-and-drop on ragged windows."""
    mask = _disk_mask()
    tracker.incorporate_detection(_frame(10), mask, [ObjectInfo(id=1)])
    frames = [_frame(11 + i) for i in range(5)]  # 5 % mem_every(2) => ragged
    probs = tracker.step_batch(frames)
    assert probs.shape == (5, 5, 64, 96)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-3)
    assert tracker.memory_engaged


def test_align_mask_to_follows_motion():
    """Key-affinity alignment projects a mask onto the object's new position
    (trained keys required — random-init attention is near-uniform)."""
    import os

    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "resources", "weights",
        "tracker_propagation.msgpack",
    )
    if not os.path.exists(ckpt):
        pytest.skip("no shipped tracker checkpoint")
    h, w = 64, 96
    core = TrackerCore(image_size=(h, w), max_objects=4, mem_frames=4, variables=ckpt)
    rng = np.random.default_rng(7)
    bg1 = (rng.uniform(0, 0.1, (h, w, 3)) * 255).astype(np.uint8)
    bg2 = (rng.uniform(0, 0.1, (h, w, 3)) * 255).astype(np.uint8)
    src = bg1.copy(); dst = bg2.copy()
    src[20:44, 8:28] = 230   # bar at x=8 in src
    dst[20:44, 56:76] = 230  # bar at x=56 in dst
    mask_src = np.zeros((h, w), np.int32)
    mask_src[20:44, 8:28] = 1
    aligned = core.align_mask_to(dst, src, mask_src)
    gt = np.zeros((h, w), bool)
    gt[20:44, 56:76] = True
    got = aligned == 1
    inter = (got & gt).sum()
    union = (got | gt).sum()
    assert union > 0 and inter / union > 0.25, f"aligned IoU {inter/max(union,1):.2f}"
    # and the OLD location should not dominate
    old = np.zeros((h, w), bool); old[20:44, 8:28] = True
    assert (got & old).sum() <= inter, "alignment stuck at source location"


def test_propagate_mask_backward_scratch_isolation(tracker):
    """Backward projection runs on a SCRATCH memory: the tracker's own memory
    state (the live video's) must be bit-identical before/after, and the
    output honors the id-mask contract."""
    import jax

    before = jax.tree.map(np.asarray, tracker.memory)
    frames = [_frame(40), _frame(41), _frame(42)]
    mask = _disk_mask() * 3  # id 3, not 1: ids must be preserved, not renumbered
    out = tracker.propagate_mask_backward(frames, mask)
    assert out.shape == (64, 96)
    assert set(np.unique(out)) <= {0, 3}
    after = jax.tree.map(np.asarray, tracker.memory)
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)
    # empty source mask short-circuits to an empty projection
    empty = tracker.propagate_mask_backward(frames, np.zeros((64, 96), np.int32))
    assert empty.sum() == 0


def test_propagate_mask_backward_follows_motion():
    """TRUE backward propagation (DEVA's voting alignment mechanism) carries a
    detection from the last buffered frame back to keyframe coordinates,
    tracking the object across intermediate positions."""
    import os

    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "resources", "weights",
        "tracker_propagation.msgpack",
    )
    if not os.path.exists(ckpt):
        pytest.skip("no shipped tracker checkpoint")
    h, w = 64, 96
    core = TrackerCore(image_size=(h, w), max_objects=4, mem_frames=4, variables=ckpt)
    rng = np.random.default_rng(11)
    xs = [8, 32, 56]  # bar slides right across the 3-frame buffer
    frames = []
    for x in xs:
        f = (rng.uniform(0, 0.1, (h, w, 3)) * 255).astype(np.uint8)
        f[20:44, x : x + 20] = 230
        frames.append(f)
    mask_src = np.zeros((h, w), np.int32)
    mask_src[20:44, xs[-1] : xs[-1] + 20] = 1
    projected = core.propagate_mask_backward(frames, mask_src)
    gt = np.zeros((h, w), bool)
    gt[20:44, xs[0] : xs[0] + 20] = True
    got = projected == 1
    inter = (got & gt).sum()
    union = (got | gt).sum()
    assert union > 0 and inter / union > 0.3, f"projected IoU {inter/max(union,1):.2f}"
    # the source location must not dominate the projection
    src_loc = np.zeros((h, w), bool)
    src_loc[20:44, xs[-1] : xs[-1] + 20] = True
    assert (got & src_loc).sum() <= inter, "projection stuck at source location"


def test_voting_align_propagate_mode():
    """align_voting='propagate' accepts a moving object that plain pixel
    voting would reject (no stationary overlap across the buffer)."""
    h, w = 64, 96
    rng = np.random.default_rng(12)

    def frame_with_bar(x):
        f = (rng.uniform(0, 0.1, (h, w, 3)) * 255).astype(np.uint8)
        f[20:44, x : x + 20] = 230
        return f

    def mask_with_bar(x):
        m = np.zeros((h, w), np.int32)
        m[20:44, x : x + 20] = 1
        return m

    import os

    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "resources", "weights",
        "tracker_propagation.msgpack",
    )
    if not os.path.exists(ckpt):
        pytest.skip("no shipped tracker checkpoint")
    core = TrackerCore(
        image_size=(h, w), max_objects=4, mem_frames=4, variables=ckpt,
        config={"align_voting": "propagate"},
    )
    xs = [8, 32, 56]
    for ti, x in enumerate(xs):
        fi = FrameInfo(
            image=frame_with_bar(x), mask=mask_with_bar(x),
            segments_info=[ObjectInfo(id=1)], ti=ti,
            info={"frame": [f"f{ti}"]},
        )
        core.add_to_temporary_buffer(fi)
    ti, mask, infos = core.vote_in_temporary_buffer("first")
    assert ti == 0
    assert len(infos) == 1 and infos[0].id == 1
    assert (mask == 1).sum() > 0  # keyframe object survives the aligned vote


def test_subpix_tail_matches_exact(tracker):
    """decode_tail_subpix (low-res parity-packed convs) must reproduce the exact
    decode_tail within fp tolerance (weights are reassociated, not changed)."""
    import jax
    import jax.numpy as jnp
    from yolo_puncture_tpu.track.network import (
        PropagationNetwork,
        decode_tail_subpix,
    )

    core = tracker
    V = core.variables
    rng = np.random.default_rng(3)
    N, No, C = 2, core.max_objects, 128
    hidden = jnp.asarray(rng.standard_normal((N, No, core.h16, core.w16, C)), jnp.float32)
    f8p = jnp.asarray(
        rng.standard_normal((N, 2 * core.h16, 2 * core.w16, 64)), jnp.float32
    )
    f4p = jnp.asarray(
        rng.standard_normal((N, 4 * core.h16, 4 * core.w16, 64)), jnp.float32
    )

    def tail(h, f8, f4):
        return core.net.apply(V, h, f8, f4, method=PropagationNetwork.decode_tail)

    exact = np.asarray(jax.vmap(tail)(hidden, f8p, f4p))
    sub = np.asarray(decode_tail_subpix(V, hidden, f8p, f4p, dtype=jnp.float32))
    assert sub.shape == exact.shape
    np.testing.assert_allclose(sub, exact, rtol=2e-4, atol=2e-4)


def test_fused_bench_assembly_cpu():
    """The bench.py fused program assembly at tiny fp32 scale: detector
    pyramid → PyramidAdapter with a letterbox content_box → windowed
    propagation at an aspect-preserving (non-square) tracker grid.  Guards the
    shared-backbone bench path end-to-end without a TPU."""
    import jax
    import jax.numpy as jnp
    from yolo_puncture_tpu.models.yolo import YOLOModel
    from yolo_puncture_tpu.ops.letterbox import letterbox, letterbox_params
    from yolo_puncture_tpu.track.train import pyramid_channels_for

    imgsz = 64
    h0, w0 = 36, 64  # 16:9-ish source → pad bands top/bottom after letterbox
    core = TrackerCore(
        image_size=(32, 48), max_objects=2, mem_frames=2, mem_every=2,
        enable_long_term=False, pyramid_adapter=True,
        pyramid_channels=pyramid_channels_for("v10", "n"),
    )
    mem = core.memory._replace(active=core.memory.active.at[0].set(True))
    model = YOLOModel(version="v10", scale="n", nc=1, task="segment")
    dvars = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    )
    _r, (new_w, new_h), (left, top) = letterbox_params(h0, w0, imgsz)
    content_box = (
        (top / imgsz, (top + new_h) / imgsz),
        (left / imgsz, (left + new_w) / imgsz),
    )

    @jax.jit
    def step(dvars, tvars, mem, frames_u8):
        imgs, _, _ = letterbox(frames_u8, imgsz, dtype=jnp.float32, bgr_to_rgb=True)
        out = model.apply(dvars, imgs)
        pyr = out["pyramid"]
        keys, skips = core.encode_pyramid(
            tvars, pyr["P3"], pyr["P4"], pyr["P5"], content_box=content_box
        )
        mem2, ids_s4 = core.propagate_frames(tvars, mem, keys, skips, window=2)
        return mem2, ids_s4

    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (4, h0, w0, 3), np.uint8)
    )
    mem2, ids = step(dvars, core.variables, mem, frames)
    assert ids.shape == (4, 8, 12)  # stride-4 grid of the (32, 48) tracker
    assert np.asarray(mem2.frame_idx) == 4
    assert np.isfinite(np.asarray(mem2.keys)).all()


def test_quantized_memory_matches_fp_readout():
    """int8 ring readout ≈ fp readout on identical content (unit-level)."""
    import jax.numpy as jnp
    from yolo_puncture_tpu.track.network import (
        memory_readout_dense,
        memory_readout_dense_int8,
    )

    rng = np.random.default_rng(0)
    T, HW, Ck, No, Cv, Q = 3, 24, 64, 2, 32, 24
    keys = rng.normal(size=(T, HW, Ck)).astype(np.float32)
    vals = rng.normal(size=(No, T, HW, Cv)).astype(np.float32)
    q = rng.normal(size=(Q, Ck)).astype(np.float32)
    valid = np.array([True, True, False])

    ref = memory_readout_dense(
        jnp.asarray(q), jnp.asarray(keys.reshape(T * HW, Ck)),
        jnp.asarray(vals.reshape(No, T * HW, Cv)),
        jnp.asarray(np.repeat(valid, HW)),
    )
    ks = np.abs(keys).max(axis=(1, 2)) / 127.0
    ki8 = np.clip(np.round(keys / np.maximum(ks, 1e-8)[:, None, None]), -127, 127)
    vs = np.abs(vals).max(axis=(2, 3)) / 127.0
    vi8 = np.clip(np.round(vals / np.maximum(vs, 1e-8)[:, :, None, None]), -127, 127)
    got = memory_readout_dense_int8(
        jnp.asarray(q), jnp.asarray(ki8, np.int8), jnp.asarray(ks),
        jnp.asarray(vi8, np.int8), jnp.asarray(vs), jnp.asarray(valid),
    )
    # int8 quantization error on softmax attention: small but nonzero
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.05)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(ref).ravel())[0, 1]
    assert corr > 0.999


def test_quantized_core_step_and_window():
    """int8-ring TrackerCore: per-frame and windowed paths agree with the fp
    core's outputs on the same inputs (random weights, structural check)."""
    fp = TrackerCore(image_size=(64, 96), max_objects=2, mem_frames=4,
                     mem_every=2, enable_long_term=False)
    q8 = TrackerCore(image_size=(64, 96), max_objects=2, mem_frames=4,
                     mem_every=2, enable_long_term=False, quantized_memory=True,
                     variables=fp.variables)
    assert str(np.asarray(q8.memory.keys).dtype) == "int8"
    mask = _disk_mask()
    p_fp = fp.incorporate_detection(_frame(0), mask, [ObjectInfo(id=1)])
    p_q8 = q8.incorporate_detection(_frame(0), mask, [ObjectInfo(id=1)])
    np.testing.assert_allclose(p_q8, p_fp, atol=0.05)
    s_fp = fp.step(_frame(1))
    s_q8 = q8.step(_frame(1))
    np.testing.assert_allclose(s_q8, s_fp, atol=0.08)
    # windowed batch path (the bench configuration) runs and stays in sync
    out = q8.step_batch([_frame(2), _frame(3)])
    assert out.shape == (2, 3, 64, 96)
    np.testing.assert_allclose(out.sum(1), 1.0, atol=1e-3)


def test_quantized_memory_rejects_long_term():
    with pytest.raises(ValueError):
        TrackerCore(image_size=(64, 96), max_objects=2, mem_frames=4,
                    enable_long_term=True, quantized_memory=True)


@pytest.mark.parametrize("long_term", [False, True])
def test_exact_windowed_matches_per_frame(long_term):
    """propagate_frames(exact=True) reproduces the per-frame serving scan
    numerically: the ring readout batched over a write window is exact (the
    ring only changes at window-end writes), and the sensory GRU threads
    through every frame exactly as step() does.  Compares per-frame stride-4
    output probs AND the full memory trajectory over two windows.

    Write-cadence alignment: incorporate writes frame 0 and leaves
    frame_idx=1; per-frame step() then writes at frame_idx % mem_every == 0,
    i.e. at frames W, 2W, … — exactly the window ends of windows
    [1..W], [W+1..2W] when window == mem_every."""
    import jax
    import jax.numpy as jnp

    from yolo_puncture_tpu.track.network import PropagationNetwork, soft_aggregate

    W = 4
    core = TrackerCore(
        image_size=(64, 96), max_objects=4, mem_frames=4, mem_every=W,
        enable_long_term=long_term, num_prototypes=16,
        max_long_term_elements=64, dtype=jnp.float32,
    )
    variables = core.variables
    rng = np.random.default_rng(7)
    images = jnp.asarray(
        rng.uniform(0, 1, size=(2 * W + 1, 64, 96, 3)).astype(np.float32)
    )
    mask0 = jnp.asarray(_disk_mask()[None].repeat(4, 0) * 0)
    mask0 = mask0.at[0].set(jnp.asarray(_disk_mask()))
    valid = jnp.asarray([True, False, False, False])
    _, mem0, _ = core._jit_incorporate(variables, core.memory, images[0], mask0, valid)
    assert int(mem0.frame_idx) == 1

    # ---- path A: per-frame serving semantics (step_from_feats with s4 decode)
    def per_frame_ref(memory, image):
        key, skips0 = core._encode1_impl(variables, image)
        readout, memory = core._read(key, memory)
        logits_s4, hidden_feat, logits_s16 = core.net.apply(
            variables, readout, skips0, memory.sensory,
            method=PropagationNetwork.decode, full_res=False,
        )
        sensory = core.net.apply(
            variables, memory.sensory, hidden_feat,
            method=PropagationNetwork.update_sensory,
        )
        memory = memory._replace(sensory=sensory)
        act = memory.active.astype(logits_s4.dtype)
        prob_s4 = soft_aggregate(logits_s4, act)
        prob_s16 = soft_aggregate(logits_s16, act)
        do_write = (memory.frame_idx % core.mem_every == 0) & jnp.any(memory.active)
        if core.enable_long_term:
            from yolo_puncture_tpu.track.memory import consolidate

            occupied = memory.valid[memory.write_pos]
            memory = consolidate(memory, core.num_prototypes, do_write & occupied)
        memory = core._write(
            variables, memory, key, skips0["f16"], prob_s16[1:], do_write
        )
        memory = memory._replace(frame_idx=memory.frame_idx + 1)
        return prob_s4, memory

    memA = mem0
    probsA = []
    for t in range(1, 2 * W + 1):
        p, memA = jax.jit(per_frame_ref)(memA, images[t])
        probsA.append(np.asarray(p))

    # ---- path B: exact windowed batch path
    keys, skips = core.net.apply(
        variables, images[1:], method=PropagationNetwork.encode_key
    )
    memB = mem0
    probsB = []
    for k in range(2):
        sl = slice(k * W, (k + 1) * W)
        pw, memB = jax.jit(core.propagate_window, static_argnames=("exact",))(
            variables, memB,
            keys[sl], {n: v[sl] for n, v in skips.items()}, exact=True,
        )
        probsB.extend(np.asarray(pw))

    for t in range(2 * W):
        np.testing.assert_allclose(probsB[t], probsA[t], atol=2e-5)
    np.testing.assert_allclose(np.asarray(memB.sensory), np.asarray(memA.sensory),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(memB.keys), np.asarray(memA.keys),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(memB.values), np.asarray(memA.values),
                               atol=2e-5)
    assert int(memB.write_pos) == int(memA.write_pos)
    assert int(memB.frame_idx) == int(memA.frame_idx)
    np.testing.assert_array_equal(np.asarray(memB.valid), np.asarray(memA.valid))
    if long_term:
        np.testing.assert_allclose(np.asarray(memB.lt_keys),
                                   np.asarray(memA.lt_keys), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(memB.lt_valid),
                                      np.asarray(memA.lt_valid))


def test_folded_denominator_readout_matches_classic():
    """The return_usage=False fast path folds the softmax denominator into the
    value matmul (ones column); it must match the classic separate-sum path
    (return_usage=True) bit-near-exactly, including rows with no valid memory."""
    import jax.numpy as jnp

    from yolo_puncture_tpu.track.network import memory_readout_dense

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((29, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((180, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((3, 180, 16)), jnp.float32)
    for frac in (0.5, 0.0):  # half-valid and ALL-INVALID memory
        valid = jnp.asarray(rng.random(180) < frac)
        fast = memory_readout_dense(q, k, v, valid)
        classic, _ = memory_readout_dense(q, k, v, valid, return_usage=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(classic),
                                   atol=1e-6)
    # bf16 affinity stays close to fp32 (quality-validated knob)
    valid = jnp.asarray(rng.random(180) < 0.7)
    a16 = memory_readout_dense(q, k, v, valid, affinity_bf16=True)
    a32 = memory_readout_dense(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(a16), np.asarray(a32), atol=0.02)


def test_step_batch_partial_window_matches_per_frame():
    """step_batch on T not a multiple of mem_every: full windows run the exact
    windowed path, the trailing partial window falls back to per-frame step()
    — so the whole run (probs AND memory trajectory, including frame_idx and
    ring contents) matches a pure per-frame step() loop.  Round 3 padded the
    partial window with a duplicate final frame, which wrote a spurious ring
    entry and advanced frame_idx past the real frame count (ADVICE r3)."""
    W = 4
    mk = dict(image_size=(64, 96), max_objects=2, mem_frames=4, mem_every=W,
              enable_long_term=False, exact_windows=True)
    coreA = TrackerCore(**mk)
    coreB = TrackerCore(**mk, variables=coreA.variables)

    rng = np.random.default_rng(11)
    frames = [rng.uniform(0, 1, size=(64, 96, 3)).astype(np.float32)
              for _ in range(W + 3)]  # 1 full window + 3-frame partial run
    mask = _disk_mask()
    pA0 = coreA.incorporate_detection(_frame(0), mask, [ObjectInfo(id=1)])
    pB0 = coreB.incorporate_detection(_frame(0), mask, [ObjectInfo(id=1)])
    np.testing.assert_allclose(pB0, pA0, atol=1e-6)

    probsA = np.stack([coreA.step(f) for f in frames])
    probsB = coreB.step_batch(frames)
    assert probsB.shape == probsA.shape  # (W+3, No+1, H, W) — no padded rows
    np.testing.assert_allclose(probsB, probsA, atol=2e-5)
    # memory trajectory identical: no duplicate-frame write, no frame_idx drift
    assert int(coreB.memory.frame_idx) == int(coreA.memory.frame_idx)
    assert int(coreB.memory.write_pos) == int(coreA.memory.write_pos)
    np.testing.assert_array_equal(np.asarray(coreB.memory.valid),
                                  np.asarray(coreA.memory.valid))
    np.testing.assert_allclose(np.asarray(coreB.memory.keys),
                               np.asarray(coreA.memory.keys), atol=2e-5)
    np.testing.assert_allclose(np.asarray(coreB.memory.sensory),
                               np.asarray(coreA.memory.sensory), atol=2e-5)


def test_propagate_frames_exact_requires_cadence_window():
    """exact=True with window != mem_every silently changes the ring-write
    cadence vs step(); it must be rejected, not silently approximated."""
    import jax.numpy as jnp

    from yolo_puncture_tpu.track.network import PropagationNetwork

    core = TrackerCore(image_size=(64, 96), max_objects=2, mem_frames=4,
                       mem_every=4, enable_long_term=False)
    imgs = jnp.zeros((8, 64, 96, 3), jnp.float32)
    keys, skips = core.net.apply(
        core.variables, imgs, method=PropagationNetwork.encode_key
    )
    with pytest.raises(ValueError, match="mem_every"):
        core.propagate_frames(core.variables, core.memory, keys, skips,
                              window=2, exact=True)
