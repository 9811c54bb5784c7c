"""Propagation-network training: teaches the tracker to carry masks through time.

The reference ships pretrained DEVA weights; this framework's propagation net is a
new TPU-native architecture, so it trains here instead — standard VOS-style
recurrent training (as in XMem/DEVA pretraining): seed memory with the ground-truth
mask at t=0 (incorporate), roll the tracker forward through the clip writing its
OWN predictions into memory (exposure-consistent with inference), and supervise
every frame's aggregated probabilities with per-pixel cross-entropy against the
ground-truth id map.

Synthetic curriculum: translating/scaling elongated bars and disks (the
needle-puncture regime: thin moving objects) generated on the fly — no external
data needed to bootstrap a usable tracker.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from yolo_puncture_tpu.track.core import TrackerCore
from yolo_puncture_tpu.track.memory import MemoryState


def make_synthetic_clip(
    rng: np.random.Generator,
    T: int = 4,
    h: int = 64,
    w: int = 96,
    max_objects: int = 2,
):
    """Moving-bar clip: images (T, h, w, 3) float[0,1], onehot masks (T, No, h, w)."""
    n_obj = int(rng.integers(1, max_objects + 1))
    images = rng.uniform(0, 0.15, size=(T, h, w, 3)).astype(np.float32)
    masks = np.zeros((T, max_objects, h, w), np.float32)
    for o in range(n_obj):
        bw = int(rng.integers(w // 4, w // 2))
        bh = int(rng.integers(4, h // 4))
        x = float(rng.integers(0, w - bw))
        y = float(rng.integers(0, h - bh))
        dx = float(rng.uniform(-3, 3))
        dy = float(rng.uniform(-2, 2))
        color = rng.uniform(0.5, 1.0, size=3)
        for t in range(T):
            x1 = int(np.clip(x + dx * t, 0, w - bw))
            y1 = int(np.clip(y + dy * t, 0, h - bh))
            images[t, y1 : y1 + bh, x1 : x1 + bw] = color
            masks[t, o, y1 : y1 + bh, x1 : x1 + bw] = 1.0
    return images, masks


def make_domain_randomized_clip(
    rng: np.random.Generator,
    T: int = 4,
    h: int = 64,
    w: int = 96,
    max_objects: int = 2,
):
    """Domain-randomized clips: textured/drifting or dark backgrounds, rotated
    elongated (needle-like) or axis-aligned objects, translation + rotation +
    optional length shrink (insertion motion), per-frame illumination jitter.

    Closes the generalization gap measured by tools/eval_tracker_quality.py:
    the original moving-bar distribution (make_synthetic_clip) transfers at
    ~0.08 IoU to textured rotated-needle footage.  Returns the same
    (images (T,h,w,3) float[0,1], onehot (T,No,h,w)) contract."""
    n_obj = int(rng.integers(1, max_objects + 1))
    # occluder sweep (r5): a dark elliptical blob crossing the scene — the
    # holdout protocol's hand/shadow analog (tools/eval_tracker_quality.py
    # make_realistic_clip occluder=True).  Occluded pixels belong to no
    # object; training must teach the memory to re-acquire after the sweep.
    occluder = rng.random() < 0.35
    if occluder:
        occ = dict(
            cy=h * rng.uniform(0.3, 0.7), ry=h * rng.uniform(0.15, 0.3),
            rx=w * rng.uniform(0.08, 0.2),
            x0=-w * 0.2, vx=w * (0.2 + 0.8 * rng.random()) / max(T - 1, 1),
            color=rng.uniform(0.0, 0.15, size=3),
        )
    # background
    if rng.random() < 0.45:
        base = np.full((h + 32, w + 32, 3), rng.uniform(0.0, 0.2), np.float32)
        base += rng.uniform(0, 0.1, size=base.shape).astype(np.float32)
    else:
        base = rng.uniform(0.15, 0.65, size=(h + 32, w + 32, 3)).astype(np.float32)
        # cheap 2-pass box smoothing via cumsum (no scipy in the hot sampler)
        k = int(rng.integers(4, 10))
        for ax in (0, 1):
            c = np.cumsum(base, axis=ax)
            lo = np.roll(c, k, axis=ax)
            idx = [slice(None)] * 3
            idx[ax] = slice(0, k)
            lo[tuple(idx)] = 0
            base = (c - lo) / k
    gy = np.linspace(0, rng.uniform(0, 0.2), h + 32)[:, None, None]
    base = np.clip(base + gy, 0, 1).astype(np.float32)
    drift = (int(rng.integers(0, 3)), int(rng.integers(0, 3)))

    images = np.zeros((T, h, w, 3), np.float32)
    masks = np.zeros((T, max_objects, h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    objs = []
    for _ in range(n_obj):
        objs.append(dict(
            cx=w * rng.uniform(0.25, 0.75), cy=h * rng.uniform(0.25, 0.75),
            angle=rng.uniform(-0.7, 0.7) if rng.random() < 0.7 else 0.0,
            length=min(h, w) * rng.uniform(0.3, 0.85),
            width=min(h, w) * rng.uniform(0.05, 0.3),
            vx=rng.uniform(-3, 3), vy=rng.uniform(-2, 2),
            va=rng.uniform(-0.03, 0.03),
            shrink=rng.uniform(0.0, 0.05) if rng.random() < 0.5 else 0.0,
            color=rng.uniform(0.55, 1.0, size=3),
        ))

    for t in range(T):
        oy = (drift[1] * t) % 32
        ox = (drift[0] * t) % 32
        img = base[oy:oy + h, ox:ox + w].copy()
        img *= rng.uniform(0.9, 1.1)
        frame_ids = np.zeros((h, w), np.int32)  # later objects occlude earlier
        for o, p in enumerate(objs):
            a = p["angle"] + p["va"] * t
            ca, sa = np.cos(a), np.sin(a)
            lcur = p["length"] * max(1.0 - p["shrink"] * t, 0.3)
            u = (xx - (p["cx"] + p["vx"] * t)) * ca + (yy - (p["cy"] + p["vy"] * t)) * sa
            v = -(xx - (p["cx"] + p["vx"] * t)) * sa + (yy - (p["cy"] + p["vy"] * t)) * ca
            m = (np.abs(u) < lcur / 2) & (np.abs(v) < p["width"] / 2)
            img[m] = p["color"] * rng.uniform(0.95, 1.05)
            frame_ids[m] = o + 1
        if occluder:
            ocx = occ["x0"] + occ["vx"] * t
            om = (((xx - ocx) / occ["rx"]) ** 2
                  + ((yy - occ["cy"]) / occ["ry"]) ** 2) < 1.0
            img[om] = occ["color"]
            frame_ids[om] = 0  # occluded pixels belong to no object
        for o in range(n_obj):
            masks[t, o] = (frame_ids == o + 1).astype(np.float32)
        images[t] = np.clip(img, 0, 1)
    return images, masks


def make_needle_serving_clip(
    rng: np.random.Generator,
    T: int = 4,
    h: int = 64,
    w: int = 96,
    max_objects: int = 2,
):
    """Serving-aligned clips: the puncture-footage distribution the serving
    eval drives (tools/eval_tracker_quality.make_serving_video — textured
    background, skin band, THIN bright rotated needle shafts with insertion
    shrink + lateral drift).

    The r4 checkpoint trained on make_domain_randomized_clip whose objects
    are 5–30% of min(h,w) wide; the serving needle is 1.4–3.0% wide — at the
    480-px serving geometry a ~7–14 px shaft that the 256²-trained net
    propagates at 0.28 IoU from a GT init (tools/diag_serving.py, r5).  This
    sampler matches the serving pixel widths; 30% of draws fall back to the
    domain-randomized distribution so the general capability is retained."""
    if rng.random() < 0.30:
        return make_domain_randomized_clip(rng, T, h, w, max_objects)
    n_obj = int(rng.integers(1, min(2, max_objects) + 1))
    size = min(h, w)
    # textured background + skin band (make_serving_video palette, /255 scale)
    base = rng.uniform(0.22, 0.49, size=(h + 32, w + 32, 3)).astype(np.float32)
    k = 6
    for ax in (0, 1):
        c = np.cumsum(base, axis=ax)
        lo = np.roll(c, k, axis=ax)
        idx = [slice(None)] * 3
        idx[ax] = slice(0, k)
        lo[tuple(idx)] = 0
        base = (c - lo) / k
    skin_y = int(h * rng.uniform(0.62, 0.78))
    skin = np.array([
        rng.uniform(0.47, 0.59), rng.uniform(0.51, 0.65), rng.uniform(0.67, 0.80)
    ], np.float32)  # BGR-ish warm band, as in make_serving_video
    base[skin_y:] = 0.25 * base[skin_y:] + 0.75 * skin
    drift_bg = (int(rng.integers(0, 3)), int(rng.integers(0, 3)))

    occluder = rng.random() < 0.25
    if occluder:
        occ = dict(
            cy=skin_y * rng.uniform(0.55, 0.95), ry=h * rng.uniform(0.10, 0.16),
            rx=w * rng.uniform(0.08, 0.12),
            x0=-w * 0.15, vx=w * (0.2 + 0.8 * rng.random()) / max(T - 1, 1),
            color=rng.uniform(0.0, 0.15, size=3),
        )

    objs = []
    for kk in range(n_obj):
        L = size * rng.uniform(0.22, 0.45)
        objs.append(dict(
            cx=w * ((0.5 + kk) / max(n_obj, 1) * 0.6 + rng.uniform(0.08, 0.25)),
            L=L,
            W=max(size * rng.uniform(0.014, 0.030), 2.5),
            theta=rng.uniform(np.radians(55), np.radians(125)),
            key=int(rng.integers(0, max(T // 2, 1))),
            rate=L * rng.uniform(0.0, 0.10),        # shrink px/frame after key
            vx=rng.uniform(-2.5, 2.5),
            color=rng.uniform(0.84, 0.98, size=3),
        ))

    images = np.zeros((T, h, w, 3), np.float32)
    masks = np.zeros((T, max_objects, h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for t in range(T):
        oy = (drift_bg[1] * t) % 32
        ox = (drift_bg[0] * t) % 32
        img = base[oy:oy + h, ox:ox + w].copy()
        img *= rng.uniform(0.95, 1.05)
        frame_ids = np.zeros((h, w), np.int32)
        for o, p in enumerate(objs):
            L = max(p["L"] - p["rate"] * max(t - p["key"], 0), 0.08 * size)
            cx = p["cx"] + p["vx"] * t
            cy = skin_y - L * 0.35
            ca, sa = np.cos(p["theta"]), np.sin(p["theta"])
            u = (xx - cx) * ca + (yy - cy) * sa
            v = -(xx - cx) * sa + (yy - cy) * ca
            m = (np.abs(u) < L / 2) & (np.abs(v) < p["W"] / 2)
            img[m] = p["color"] * rng.uniform(0.97, 1.03)
            frame_ids[m] = o + 1
        if occluder:
            ocx = occ["x0"] + occ["vx"] * t
            om = (((xx - ocx) / occ["rx"]) ** 2
                  + ((yy - occ["cy"]) / occ["ry"]) ** 2) < 1.0
            img[om] = occ["color"]
            frame_ids[om] = 0
        for o in range(max_objects):
            masks[t, o] = (frame_ids == o + 1).astype(np.float32)
        images[t] = np.clip(img, 0, 1)
    return images, masks


def build_windowed_propagation_loss(core: TrackerCore, window: int):
    """Like build_propagation_loss but rolls out through the WINDOWED
    propagation program (propagate_window: batched readout/decode against the
    window-start memory, deep-update-at-write) so the windowed serving path is
    exposure-consistent with training.  Requires (T-1) % window == 0."""

    def loss_fn(variables, images, onehot, obj_valid):
        T = images.shape[0]
        assert (T - 1) % window == 0, "clip_len-1 must be a multiple of window"
        obj_valid_b = obj_valid > 0.5
        prob0, memory, _ = core._incorporate_impl(
            variables, core.memory, images[0], onehot[0], obj_valid_b
        )

        def ce_of(prob, m_t):
            gt_fg = m_t * obj_valid[:, None, None]
            gt_bg = jnp.clip(1.0 - gt_fg.sum(0, keepdims=True), 0.0, 1.0)
            gt = jnp.concatenate([gt_bg, gt_fg], axis=0)
            gt = gt / jnp.maximum(gt.sum(0, keepdims=True), 1e-6)
            return -(gt * jnp.log(jnp.clip(prob, 1e-6, 1.0))).sum(0).mean()

        n_win = (T - 1) // window
        imgs_w = images[1:].reshape(n_win, window, *images.shape[1:])
        masks_w = onehot[1:].reshape(n_win, window, *onehot.shape[1:])

        def step(carry, inp):
            memory, total = carry
            img_w, m_w = inp
            probs, memory = core._window_impl(variables, memory, img_w)
            ce = jax.vmap(ce_of)(probs, m_w).sum()
            return (memory, total + ce), ce

        (memory, total), _ = jax.lax.scan(step, (memory, 0.0), (imgs_w, masks_w))
        return total / (T - 1)

    return loss_fn


def build_propagation_loss(core: TrackerCore, pyramid_fn=None):
    """loss(variables, images (T,H,W,3), onehot (T,No,H,W), valid (No,)) → scalar.

    Rollout matches inference exactly (same _incorporate/_step programs), so
    training-serving skew is zero.

    With ``pyramid_fn`` (images (T,H,W,3) → frozen detector pyramid dict with
    P3/P4/P5), the rollout trains the SHARED-BACKBONE path instead: features
    come from core.encode_pyramid (PyramidAdapter + decoder train; the backbone
    is stop-gradiented), mirroring the fused streaming pipeline.
    """

    def loss_fn(variables, images, onehot, obj_valid):
        T = images.shape[0]
        mem0 = core.memory  # zeros template (host attr never mutated here)
        obj_valid_b = obj_valid > 0.5

        if pyramid_fn is not None:
            pyr = jax.lax.stop_gradient(pyramid_fn(images))
            keys, skips = core.encode_pyramid(
                variables, pyr["P3"], pyr["P4"], pyr["P5"]
            )
            prob0, memory, _ = core._incorporate_from_feats(
                variables, mem0, keys[0], {k: v[0] for k, v in skips.items()},
                onehot[0], obj_valid_b,
            )
        else:
            prob0, memory, _ = core._incorporate_impl(
                variables, mem0, images[0], onehot[0], obj_valid_b
            )

        def ce_of(prob, m_t):
            gt_fg = m_t * obj_valid[:, None, None]
            gt_bg = jnp.clip(1.0 - gt_fg.sum(0, keepdims=True), 0.0, 1.0)
            gt = jnp.concatenate([gt_bg, gt_fg], axis=0)  # (No+1, H, W)
            gt = gt / jnp.maximum(gt.sum(0, keepdims=True), 1e-6)
            return -(gt * jnp.log(jnp.clip(prob, 1e-6, 1.0))).sum(0).mean()

        if pyramid_fn is not None:

            def step(carry, inp):
                memory, total = carry
                key_t, sk_t, m_t = inp
                prob, memory = core._step_from_feats(variables, memory, key_t, sk_t)
                ce = ce_of(prob, m_t)
                return (memory, total + ce), ce

            (memory, total), _ = jax.lax.scan(
                step, (memory, 0.0),
                (keys[1:], {k: v[1:] for k, v in skips.items()}, onehot[1:]),
            )
        else:

            def step(carry, inp):
                memory, total = carry
                img, m_t = inp
                prob, memory = core._step_impl(variables, memory, img)
                ce = ce_of(prob, m_t)
                return (memory, total + ce), ce

            (memory, total), _ = jax.lax.scan(
                step, (memory, 0.0), (images[1:], onehot[1:])
            )
        return total / (T - 1)

    return loss_fn


def pyramid_channels_for(version: str = "v10", scale: str = "s"):
    """(C3, C4, C5) channel widths of the detector's P3/P4/P5 pyramid for a
    given scale — what ``TrackerCore(pyramid_channels=...)`` must init with so
    the PyramidAdapter's 1×1 projections match the backbone that feeds them."""
    from yolo_puncture_tpu.models.yolo import SCALES, make_divisible

    _, width, max_ch = SCALES[version][scale]
    return tuple(make_divisible(min(c, max_ch) * width, 8) for c in (256, 512, 1024))


def make_yolo_pyramid_fn(
    version: str = "v10",
    scale: str = "s",
    seed: int = 0,
    dtype=jnp.float32,
    ratio: float = 4.0 / 3.0,
    variables=None,
):
    """Frozen YOLO backbone as a pyramid source for shared-backbone training.

    Mirrors the fused bench: the detector sees the letterboxed frame at
    ``ratio``× the tracker geometry (640² detector / 480² tracker → 4/3).
    Returns (pyramid_fn images (T,h,w,3) → {P3,P4,P5}, backbone_variables).
    """
    from yolo_puncture_tpu.models.yolo import YOLOModel

    model = YOLOModel(version=version, scale=scale, nc=1, task="segment", dtype=dtype)

    def pyramid_fn_factory(bvars):
        def pyramid_fn(images):
            T, h, w = images.shape[0], images.shape[1], images.shape[2]
            hb = int(round(h * ratio / 32)) * 32
            wb = int(round(w * ratio / 32)) * 32
            imgs = jax.image.resize(
                images.astype(dtype), (T, hb, wb, 3), "bilinear"
            )
            return model.apply(bvars, imgs)["pyramid"]

        return pyramid_fn

    if variables is None:
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
    return pyramid_fn_factory(variables), variables


class PropagationTrainer:
    def __init__(
        self,
        core: TrackerCore,
        lr: float = 3e-4,
        clip_len: int = 4,
        batch_size: int = 1,
        seed: int = 0,
        pyramid_fn=None,
        clip_fn=None,
        window_mix: float = 0.0,
        window: int = 4,
    ):
        self.core = core
        self.clip_len = clip_len
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.pyramid_fn = pyramid_fn
        self.clip_fn = clip_fn or make_synthetic_clip
        # window_mix > 0: that fraction of steps trains through the WINDOWED
        # propagation program so the batched serving path (bench/step_batch)
        # stays exposure-consistent — per-frame-only fine-tuning measurably
        # regresses windowed quality (test_windowed_propagation_quality)
        self.window_mix = float(window_mix)
        self.window = int(window)
        # Optimize ONLY the 'params' collection: BN running statistics
        # (batch_stats) receive nonzero grads through the use_running_average
        # forward and must not be Adam-updated (they are statistics, and the
        # separate BN-recalibration pass assumes they stay statistics).
        # NOTE: set_to_zero (not optax.masked) — masked passes the un-masked
        # updates through as RAW gradients, which apply_updates would add.
        self.tx = optax.multi_transform(
            {"adam": optax.adam(lr), "freeze": optax.set_to_zero()},
            lambda v: {k: ("adam" if k == "params" else "freeze") for k in v},
        )
        loss_fn = build_propagation_loss(core, pyramid_fn=pyramid_fn)

        def batched_loss(variables, images, onehot, obj_valid):
            # vmap over the clip batch — fills the MXU (a single clip is tiny)
            losses = jax.vmap(loss_fn, in_axes=(None, 0, 0, 0))(
                variables, images, onehot, obj_valid
            )
            return losses.mean()

        @jax.jit
        def train_step(variables, opt_state, images, onehot, obj_valid):
            loss, grads = jax.value_and_grad(batched_loss)(
                variables, images, onehot, obj_valid
            )
            updates, opt_state = self.tx.update(grads, opt_state)
            variables = optax.apply_updates(variables, updates)
            return variables, opt_state, loss

        self._train_step = train_step
        self._train_step_win = None
        if self.window_mix > 0:
            if pyramid_fn is not None:
                raise ValueError("window_mix training is for the self-contained "
                                 "encoder path (pyramid_fn=None)")
            if (clip_len - 1) % self.window:
                raise ValueError(
                    f"clip_len-1 ({clip_len - 1}) must be a multiple of "
                    f"window ({self.window}) for windowed rollouts"
                )
            wloss = build_windowed_propagation_loss(core, self.window)

            def batched_wloss(variables, images, onehot, obj_valid):
                return jax.vmap(wloss, in_axes=(None, 0, 0, 0))(
                    variables, images, onehot, obj_valid
                ).mean()

            @jax.jit
            def train_step_win(variables, opt_state, images, onehot, obj_valid):
                loss, grads = jax.value_and_grad(batched_wloss)(
                    variables, images, onehot, obj_valid
                )
                updates, opt_state = self.tx.update(grads, opt_state)
                variables = optax.apply_updates(variables, updates)
                return variables, opt_state, loss

            self._train_step_win = train_step_win
        self.opt_state = self.tx.init(core.variables)

    def _sample_batch(self):
        h, w = self.core.image_size
        No = self.core.max_objects
        imgs, msks, valids = [], [], []
        for _ in range(self.batch_size):
            images, masks = self.clip_fn(
                self.rng, self.clip_len, h, w, max_objects=No
            )
            imgs.append(images)
            msks.append(masks)
            valids.append((masks.sum((0, 2, 3)) > 0).astype(np.float32))
        return (
            jnp.asarray(np.stack(imgs)),
            jnp.asarray(np.stack(msks)),
            jnp.asarray(np.stack(valids)),
        )

    def fit(self, steps: int = 200, log_every: int = 50):
        variables = self.core.variables
        last = None
        for i in range(steps):
            images, onehot, obj_valid = self._sample_batch()
            step_fn = self._train_step
            if self._train_step_win is not None and self.rng.random() < self.window_mix:
                step_fn = self._train_step_win
            variables, self.opt_state, loss = step_fn(
                variables, self.opt_state, images, onehot, obj_valid
            )
            last = float(loss)
            if log_every and (i % log_every == 0):
                print(f"propagation step {i}: loss {last:.4f}")
        self.core.variables = variables
        return last

    def eval_propagation_iou(self, n_clips: int = 8) -> float:
        """Mean IoU of propagated masks vs ground truth on fresh clips."""
        h, w = self.core.image_size
        No = self.core.max_objects
        if self.pyramid_fn is not None and not hasattr(self, "_jit_eval_feats"):
            pyramid_fn = self.pyramid_fn

            @jax.jit
            def encode_clip(variables, images):
                pyr = pyramid_fn(images)
                return self.core.encode_pyramid(variables, pyr["P3"], pyr["P4"], pyr["P5"])

            self._jit_eval_feats = (
                encode_clip,
                jax.jit(self.core._incorporate_from_feats),
                jax.jit(self.core._step_from_feats),
            )
        ious = []
        for _ in range(n_clips):
            images, masks = self.clip_fn(self.rng, self.clip_len, h, w, No)
            obj_valid = (masks.sum((0, 2, 3)) > 0)
            mem = self.core.memory
            if self.pyramid_fn is not None:
                encode_clip, inc_f, step_f = self._jit_eval_feats
                keys, skips = encode_clip(self.core.variables, jnp.asarray(images))
                prob, mem, _ = inc_f(
                    self.core.variables, mem, keys[0],
                    {k: v[0] for k, v in skips.items()},
                    jnp.asarray(masks[0]), jnp.asarray(obj_valid),
                )
            else:
                prob, mem, _ = self.core._jit_incorporate(
                    self.core.variables, mem, jnp.asarray(images[0]),
                    jnp.asarray(masks[0]), jnp.asarray(obj_valid),
                )
            for t in range(1, self.clip_len):
                if self.pyramid_fn is not None:
                    prob, mem = step_f(
                        self.core.variables, mem, keys[t],
                        {k: v[t] for k, v in skips.items()},
                    )
                else:
                    prob, mem = self.core._jit_step(
                        self.core.variables, mem, jnp.asarray(images[t])
                    )
                pred = np.asarray(jnp.argmax(prob, 0))
                for o in range(No):
                    if not obj_valid[o]:
                        continue
                    p = pred == (o + 1)
                    g = masks[t, o] > 0.5
                    union = (p | g).sum()
                    if union:
                        ious.append((p & g).sum() / union)
        return float(np.mean(ious)) if ious else 0.0
