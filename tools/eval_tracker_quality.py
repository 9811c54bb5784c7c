#!/usr/bin/env python
"""Tracker propagation quality vs the perf knobs the headline bench stacks
(VERDICT.md round-1 item 4).

The reference's propagation quality is whatever DEVA's released checkpoint
gives (yolo_seg/yolo_with_deva.py:103-208); this framework ships its own
propagation network, so propagation quality must be measured, per knob:

  base       per-frame step, fp32 memory, self-contained encoder
  window4    windowed propagation (batch of 4 frames per memory update)
  subpix     sub-pixel tail readout
  int8       int8-quantized memory ring
  shared     PyramidAdapter over the (frozen) detector backbone pyramid

Protocol: held-out *realistic* clips — textured moving background, an
elongated rotated needle-like object that translates, rotates and shrinks
(insertion motion), per-frame illumination jitter — deliberately OUTSIDE the
axis-aligned moving-bar training distribution (track/train.py
make_synthetic_clip).  Propagate from the frame-0 ground-truth mask and score
per-frame IoU vs ground truth.  No real patient videos exist in this
environment; this synthetic-holdout protocol is the documented substitute.

    python tools/eval_tracker_quality.py                # full table
    python tools/eval_tracker_quality.py --quick        # 2 configs, small
Writes docs/tracker_quality.md and prints one JSON line.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def make_realistic_clip(rng, T, h, w, shrink=True, n_objects=1, occluder=False):
    """Needle-like rotated bar(s) over textured drifting background.

    ``n_objects=2`` adds a second independently-moving bar (multi-instance;
    where the bars cross, the later-drawn bar owns the pixel — visible-region
    ground truth, VOS convention).  ``occluder=True`` sweeps a dark elliptical
    blob across the scene; occluded pixels belong to no object (frames where
    an object is fully hidden have empty GT and are skipped in scoring).

    Returns images (T, h, w, 3) float[0,1], masks (T, n_objects, h, w)
    float{0,1}."""
    # textured background: smoothed noise + gradient, drifting
    base = rng.uniform(0.2, 0.6, size=(h + 40, w + 40, 3)).astype(np.float32)
    k = np.ones((9, 9), np.float32) / 81.0
    for c in range(3):
        from scipy.signal import convolve2d

        base[..., c] = convolve2d(base[..., c], k, mode="same", boundary="symm")
    gy = np.linspace(0, 0.15, h + 40)[:, None, None]
    base = np.clip(base + gy, 0, 1)

    objs = []
    for k in range(n_objects):
        objs.append(dict(
            cx=w * rng.uniform(0.3, 0.7), cy=h * rng.uniform(0.3, 0.7),
            angle=rng.uniform(-0.5, 0.5) + (1.1 if k else 0.0),  # 2nd bar crosses
            length=min(h, w) * rng.uniform(0.55, 0.8),
            width=max(3.0, min(h, w) * 0.06),
            vx=rng.uniform(-2.0, 2.0), vy=rng.uniform(-1.5, 1.5),
            va=rng.uniform(-0.02, 0.02),
            color=rng.uniform(0.75, 0.95, size=3),
        ))
    if occluder:
        # dark blob sweeping left→right across the clip (hand/shadow analog)
        occ = dict(
            cy=h * rng.uniform(0.35, 0.65), ry=h * rng.uniform(0.18, 0.3),
            rx=w * rng.uniform(0.10, 0.16),
            shade=rng.uniform(0.05, 0.18, size=3),
        )

    images = np.zeros((T, h, w, 3), np.float32)
    masks = np.zeros((T, n_objects, h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for t in range(T):
        ox, oy = int(2 * t) % 40, int(1 * t) % 40
        img = base[oy:oy + h, ox:ox + w].copy()
        img *= rng.uniform(0.92, 1.08)  # illumination jitter
        frame_ms = []
        for k, o in enumerate(objs):
            a = o["angle"] + o["va"] * t
            ca, sa = np.cos(a), np.sin(a)
            lcur = o["length"] * (1.0 - (0.04 * t if shrink and k == 0 else 0.0))
            u = (xx - (o["cx"] + o["vx"] * t)) * ca + (yy - (o["cy"] + o["vy"] * t)) * sa
            v = -(xx - (o["cx"] + o["vx"] * t)) * sa + (yy - (o["cy"] + o["vy"] * t)) * ca
            m = (np.abs(u) < lcur / 2) & (np.abs(v) < o["width"] / 2)
            img[m] = o["color"] * rng.uniform(0.95, 1.05)
            # visible-region GT: later-drawn bars own crossing pixels
            for prev in frame_ms:
                prev &= ~m
            frame_ms.append(m)
        if occluder:
            # sweep: enters at ~T/4, exits at ~3T/4
            ocx = w * (-0.2 + 1.4 * t / max(T - 1, 1))
            om = (((xx - ocx) / occ["rx"]) ** 2 + ((yy - occ["cy"]) / occ["ry"]) ** 2) < 1.0
            img[om] = occ["shade"] * rng.uniform(0.9, 1.1)
            for m in frame_ms:
                m &= ~om
        for k, m in enumerate(frame_ms):
            masks[t, k] = m.astype(np.float32)
        images[t] = np.clip(img, 0, 1)
    return images, masks


def _iou(pred_slot, gt):
    inter = (pred_slot & gt).sum()
    union = (pred_slot | gt).sum()
    return float(inter / union) if union else float("nan")


def eval_config(name, core, clips, window=0, pyramid_fn=None, exact=False):
    """Propagate each clip from frame-0 GT; return mean IoU over frames 1..T-1."""
    from yolo_puncture_tpu.track.network import PropagationNetwork

    ious = []
    No = core.max_objects
    jit_enc = jax.jit(
        lambda v, imgs: core.net.apply(v, imgs, method=PropagationNetwork.encode_key)
    )
    if pyramid_fn is not None:
        jit_enc_pyr = jax.jit(
            lambda v, imgs: core.encode_pyramid(
                v, *(lambda p: (p["P3"], p["P4"], p["P5"]))(pyramid_fn(imgs))
            )
        )
    jit_inc = jax.jit(core._incorporate_from_feats)
    jit_step = jax.jit(core._step_from_feats)
    jit_win = jax.jit(
        core.propagate_frames,
        static_argnames=("window", "exact", "return_logits"),
    )
    from yolo_puncture_tpu.ops.masks import upsample_bilinear_matmul

    def score_ids(ids_t, masks_t, K):
        """Per-object IoU at one frame; objects with empty GT (fully occluded
        or off-frame) are skipped — VOS convention."""
        for k in range(K):
            gt = masks_t[k] > 0.5
            if not gt.any():
                continue
            v = _iou(ids_t == (k + 1), gt)
            if not np.isnan(v):
                ious.append(v)

    for images, masks in clips:
        T, K = images.shape[0], min(masks.shape[1], No)
        onehot0 = np.zeros((No, *images.shape[1:3]), np.float32)
        obj_valid = np.zeros((No,), bool)
        for k in range(K):
            onehot0[k] = masks[0, k]
            obj_valid[k] = bool(masks[0, k].any())

        if pyramid_fn is not None:
            keys, skips = jit_enc_pyr(core.variables, jnp.asarray(images))
        else:
            keys, skips = jit_enc(core.variables, jnp.asarray(images))
        mem = core.memory
        prob, mem, _ = jit_inc(
            core.variables, mem, keys[0], {k: v[0] for k, v in skips.items()},
            jnp.asarray(onehot0), jnp.asarray(obj_valid),
        )
        if window and window > 1:
            t = 1
            while t < T:
                e = min(t + window, T)
                if e - t < window:
                    # trailing partial window: per-frame step() fallback (the
                    # step_batch semantics since r4 — a short window would
                    # change the write cadence vs per-frame, ADVICE r3)
                    for tt in range(t, e):
                        prob, mem = jit_step(
                            core.variables, mem, keys[tt],
                            {k: v[tt] for k, v in skips.items()},
                        )
                        score_ids(np.asarray(jnp.argmax(prob, 0)), masks[tt], K)
                    t = e
                    continue
                act = mem.active.astype(np.float32)
                mem, logits_s4 = jit_win(
                    core.variables, mem,
                    keys[t:e], {k: v[t:e] for k, v in skips.items()},
                    window=e - t, exact=exact, return_logits=True,
                )
                # upsample LOGITS to full res, then aggregate — the step()
                # output order (aggregating at s4 then upsampling probs
                # costs ~0.18 IoU on thin objects)
                from yolo_puncture_tpu.track.network import soft_aggregate
                logits = upsample_bilinear_matmul(
                    logits_s4.reshape(-1, *logits_s4.shape[2:]),
                    images.shape[1], images.shape[2],
                ).reshape(*logits_s4.shape[:2], images.shape[1], images.shape[2])
                probs = jax.vmap(lambda lg: soft_aggregate(lg, jnp.asarray(act)))(logits)
                ids = np.asarray(jnp.argmax(probs, axis=1))
                for j in range(e - t):
                    score_ids(ids[j][: images.shape[1], : images.shape[2]],
                              masks[t + j], K)
                t = e
        else:
            for t in range(1, T):
                prob, mem = jit_step(
                    core.variables, mem, keys[t],
                    {k: v[t] for k, v in skips.items()},
                )
                score_ids(np.asarray(jnp.argmax(prob, 0)), masks[t], K)
    return float(np.mean(ious)) if ious else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=432)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--serving", action="store_true",
                    help="quarter-serving-scale protocol through the "
                    "apps/track_video scheduler (semionline voting + "
                    "long-term tier); writes docs/tracker_quality_serving.md")
    ap.add_argument("--serve_height", type=int, default=240)
    ap.add_argument("--serve_width", type=int, default=432)
    ap.add_argument("--serve_frames", type=int, default=64)
    ap.add_argument("--serve_clips", type=int, default=2)
    ap.add_argument("--weights", default=os.path.join(
        REPO, "resources", "weights", "tracker_propagation.msgpack"))
    ap.add_argument("--shared-weights", default=os.path.join(
        REPO, "resources", "weights", "tracker_shared.msgpack"))
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "tracker_quality.md"))
    args = ap.parse_args()
    if args.quick:
        # CPU-smoke scale (the r1-r3 protocol geometry)
        args.height, args.width, args.frames, args.clips = 96, 160, 10, 2
    if args.serving:
        return serving_eval(args)

    from yolo_puncture_tpu.track.core import TrackerCore
    from yolo_puncture_tpu.track.train import make_yolo_pyramid_fn, pyramid_channels_for

    rng = np.random.default_rng(args.seed)
    # r4 protocol mix (VERDICT r3 item 5): half the clips are multi-instance
    # (a second crossing bar), half of each group sweeps a dark occluder
    # across the scene.  --quick keeps the old tiny single-object protocol.
    clips = [
        make_realistic_clip(
            rng, args.frames, args.height, args.width,
            n_objects=(2 if i % 2 else 1) if not args.quick else 1,
            occluder=(i % 4 >= 2) and not args.quick,
        )
        for i in range(args.clips)
    ]
    size = (args.height, args.width)
    base_kw = dict(
        image_size=size, max_objects=2, mem_frames=8, mem_every=4,
        enable_long_term=False, dtype=jnp.float32,
    )
    w = args.weights if os.path.exists(args.weights) else None

    def core_of(**kw):
        merged = dict(base_kw)
        merged.update(kw)
        return TrackerCore(variables=w, **merged)

    configs = [
        ("base (per-frame, fp32)", core_of(), dict()),
        ("window4 (legacy approx)", core_of(), dict(window=4, exact=False)),
        ("exact window4 (headline)", core_of(), dict(window=4, exact=True)),
        # the configuration bench.py actually ships by default: exact window4
        # + subpix tail + bf16 compute dtype + bf16 affinity (ADVICE r3: these
        # knobs must be quality-measured together, not assumed from fp32 rows)
        ("bench-exact (bf16 dtype+affinity, subpix tail)",
         core_of(subpix_tail=True, affinity_bf16=True, dtype=jnp.bfloat16),
         dict(window=4, exact=True)),
        ("subpix_tail", core_of(subpix_tail=True), dict()),
        ("int8 memory", core_of(quantized_memory=True), dict()),
        ("max_objects=4", core_of(max_objects=4), dict(window=4, exact=True)),
    ]
    if args.quick:
        configs = configs[:4]
    elif os.path.exists(args.shared_weights):
        # seed=0 matches the frozen backbone the shared checkpoint trained against
        pyr_fn, _ = make_yolo_pyramid_fn("v10", "s", seed=0, dtype=jnp.float32)
        shared_core = TrackerCore(
            variables=args.shared_weights, pyramid_adapter=True,
            pyramid_channels=pyramid_channels_for("v10", "s"), **base_kw,
        )
        configs.append(("shared pyramid", shared_core, dict(pyramid_fn=pyr_fn)))

    rows = []
    base_iou = None
    for name, core, kw in configs:
        iou = eval_config(name, core, clips, **kw)
        if base_iou is None:
            base_iou = iou
        rows.append((name, iou, iou - base_iou))
        print(f"{name:28s} IoU {iou:.3f}  Δbase {iou - base_iou:+.3f}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
            "# Tracker propagation quality vs perf knobs\n\n"
            f"Protocol (r4, VERDICT r3 item 5): {args.clips} held-out realistic "
            f"clips ({args.frames} frames @ {args.height}×{args.width}), textured "
            "drifting background, rotated shrinking needle-like objects — outside "
            "the moving-bar training distribution.  Half the clips are "
            "multi-instance (a second crossing bar; visible-region GT at "
            "crossings), half of each group has a dark occluder sweeping the "
            "scene (fully-occluded frames skipped per object, VOS convention).  "
            "Propagate from frame-0 GT; mean per-frame per-object IoU vs GT.\n"
            f"Checkpoint: `{os.path.relpath(args.weights, REPO)}`.\n"
            "Generated by `tools/eval_tracker_quality.py` "
            "(VERDICT.md round-1 item 4).\n\n"
            "| config | mean IoU | Δ vs base |\n|---|---|---|\n"
        )
        for name, iou, d in rows:
            f.write(f"| {name} | {iou:.3f} | {d:+.3f} |\n")
        f.write(
            "\nNotes:\n"
            "- `bench-exact` is the configuration `python bench.py` ships by\n"
            "  default — exact window4 + subpix tail + bf16 compute dtype +\n"
            "  bf16 affinity (BENCH_AFF16=1) — measured here as ONE row so the\n"
            "  headline (fps, IoU) pair cites a configuration that was actually\n"
            "  run through the quality protocol (ADVICE r3).\n"
            "- `exact window4` is the HEADLINE bench configuration: the ring\n"
            "  readout batches per write window (exact — the ring only changes\n"
            "  at window-end writes) while the sensory GRU threads per frame;\n"
            "  numerically equal to the per-frame `step()` scan\n"
            "  (tests/test_track.py::test_exact_windowed_matches_per_frame),\n"
            "  hence \u0394 +0.000 by construction.\n"
            "- `window4 (legacy approx)` deep-updates the sensory once per\n"
            "  window.  Round 2 reported \u22120.22 IoU for this knob; nearly all\n"
            "  of that was an OUTPUT-path artifact (aggregating at stride 4 and\n"
            "  nearest-upsampling ids instead of upsampling LOGITS to full res\n"
            "  before aggregation, as step() does).  With the output order\n"
            "  fixed everywhere (r3), the true cost of the approximation is\n"
            "  \u22640.003 IoU \u2014 and the exact mode removes even that at the same\n"
            "  throughput, so nothing uses the approximation by default.\n"
            "- `shared pyramid` reads the FROZEN random-weight detector pyramid\n"
            "  available in-env \u2014 no meaningful features (cf.\n"
            "  tracker_shared_n_trained.msgpack: 0.245 holdout against a\n"
            "  synthetic-protocol-trained backbone).  It remains a\n"
            "  throughput-first experiment, NOT the headline (BENCH_SHARED=0\n"
            "  default since r3).\n"
            "- serving-scale protocol (long clips, voting, long-term tier):\n"
            "  docs/tracker_quality_serving.md.\n"
        )
    print(json.dumps({
        "metric": "tracker propagation IoU (realistic holdout)",
        "rows": [{"config": n, "iou": round(i, 4), "delta": round(d, 4)}
                 for n, i, d in rows],
    }))




# ---------------------------------------------------------------------------
# Serving-scale protocol (VERDICT r2 item 3): quarter-serving geometry,
# long clips, driven through the REAL serving entry points — the
# apps/track_video scheduler (auto_segment → add_to_temporary_buffer →
# vote_in_temporary_buffer → incorporate_detection → step/step_batch) with
# semionline voting and the long-term tier engaged.
# ---------------------------------------------------------------------------


class _GTDetector:
    """YOLO stand-in for the serving eval: returns the clip's ground-truth
    mask (optionally degraded) for whatever frame the scheduler hands it,
    keyed by frame bytes — auto_segment's yolo_model surface."""

    class _Masks:
        def __init__(self, data):
            self.data = data

        def __len__(self):
            return len(self.data)

    class _Boxes:
        def __init__(self, n):
            self.conf = np.full((n,), 0.95, np.float32)
            self.cls = np.zeros((n,), np.int64)

    class _Result:
        def __init__(self, masks):
            n = len(masks)
            self.masks = _GTDetector._Masks(masks) if n else None
            self.boxes = _GTDetector._Boxes(n)

    def __init__(self, images_u8, masks, noise_rng=None):
        import cv2

        self._by_key = {}
        self._thumbs = images_u8[:, ::4, ::4].astype(np.int16)
        self._masks_by_t = []
        for t in range(len(images_u8)):
            m = (masks[t, 0] > 0.5).astype(np.float32)
            if noise_rng is not None:
                # detector imperfection: random dilate/erode + dropout
                k = int(noise_rng.integers(1, 4))
                kern = np.ones((k, k), np.uint8)
                m = (cv2.dilate(m, kern) if noise_rng.random() < 0.5
                     else cv2.erode(m, kern))
            # keyed on downsampled bytes of the exact frame the scheduler
            # passes back (auto_segment may have resized it first)
            self._by_key[images_u8[t][::4, ::4].tobytes()] = [m]
            self._masks_by_t.append([m])

    def predict(self, image_bgr, **kw):
        import cv2

        img = np.ascontiguousarray(image_bgr[..., ::-1])
        key = img[::4, ::4].tobytes()
        masks = self._by_key.get(key)
        if masks is None:
            # scheduler resized the frame: match by nearest stored thumbnail
            th = cv2.resize(img, (self._thumbs.shape[2], self._thumbs.shape[1]),
                            interpolation=cv2.INTER_LINEAR)[::1, ::1]
            d = np.abs(self._thumbs - th.astype(np.int16)).mean(axis=(1, 2, 3))
            masks = self._masks_by_t[int(np.argmin(d))]
        h, w = img.shape[:2]
        out = [cv2.resize(m, (w, h), interpolation=cv2.INTER_LINEAR)
               for m in (masks or [])]
        return [self._Result(out)]


class _CaptureSaver:
    """ResultSaver stand-in: collects argmax id masks per frame name."""

    def __init__(self):
        self.by_name = {}

    def save_mask(self, prob, frame_name, need_resize=False, shape=None,
                  image_np=None):
        import cv2

        prob = np.asarray(prob)
        ids = np.argmax(prob, axis=0).astype(np.int32)
        if need_resize and shape is not None and ids.shape != tuple(shape):
            ids = cv2.resize(ids, (shape[1], shape[0]),
                             interpolation=cv2.INTER_NEAREST)
        self.by_name[frame_name] = ids


def serving_eval(args):
    """Quarter-serving-scale eval through the serving scheduler."""
    from apps.track_video import process_frame, process_video_batched
    from yolo_puncture_tpu.track.core import TrackerCore

    H, W, T = args.serve_height, args.serve_width, args.serve_frames
    rng = np.random.default_rng(args.seed + 1)
    clips = [make_realistic_clip(rng, T, H, W) for _ in range(args.serve_clips)]
    w = args.weights if os.path.exists(args.weights) else None

    def run(name, batched, exact_windows=True, long_term=True):
        ious = []
        for ci, (images, masks) in enumerate(clips):
            images_u8 = (np.clip(images, 0, 1) * 255).astype(np.uint8)
            cfg = dict(
                temporal_setting="semionline", num_voting_frames=3,
                detection_every=10, size=H, suppress_small_objects=True,
                mem_every=4, enable_long_term=long_term,
                # quarter-scale long-term pressure: small ring + small bank so
                # consolidation actually engages within T frames
                max_mid_term_frames=8, num_prototypes=64,
                max_long_term_elements=256, exact_windows=exact_windows,
            )
            core = TrackerCore(
                config=cfg, image_size=(H, W), max_objects=4, mem_frames=8,
                variables=w, dtype=jnp.float32,
            )
            det = _GTDetector(images_u8, masks,
                              noise_rng=np.random.default_rng(1000 + ci))
            saver = _CaptureSaver()
            if batched:
                reader = ((images_u8[t], f"f{t:04d}.jpg") for t in range(T))
                process_video_batched(core, det, reader, saver)
            else:
                for t in range(T):
                    process_frame(core, det, f"f{t:04d}.jpg", saver, t,
                                  image_np=images_u8[t])
            if long_term:
                assert bool(np.asarray(core.memory.lt_valid).any()), (
                    "long-term tier never engaged — protocol must exercise it")
            for t in range(1, T):
                ids = saver.by_name.get(f"f{t:04d}.jpg")
                if ids is None:
                    continue
                pred = ids == 1
                v = _iou(pred, masks[t, 0] > 0.5)
                if not np.isnan(v):
                    ious.append(v)
        return float(np.mean(ious)) if ious else 0.0

    rows = []
    configs = [
        ("per-frame step() scheduler (serving default)", dict(batched=False)),
        ("batched step_batch (exact windows)", dict(batched=True)),
        ("batched step_batch (legacy window approx)",
         dict(batched=True, exact_windows=False)),
        ("per-frame, long-term off", dict(batched=False, long_term=False)),
    ]
    if args.quick:
        configs = configs[:2]
    for name, kw in configs:
        iou = run(name, **kw)
        rows.append((name, iou))
        print(f"{name:44s} IoU {iou:.3f}", flush=True)

    out = os.path.join(REPO, "docs", "tracker_quality_serving.md")
    with open(out, "w") as f:
        f.write(
            "# Tracker quality at (quarter-)serving scale through the serving API\n\n"
            f"Protocol: {args.serve_clips} realistic clips, {T} frames @ "
            f"{H}\u00d7{W} (quarter of the 480\u00d7864 serving geometry), driven "
            "through the apps/track_video scheduler itself: auto_segment \u2192 "
            "semionline voting (num_voting_frames=3) \u2192 incorporate_detection "
            "every detection_every=10 frames \u2192 step/step_batch propagation, "
            "with the LONG-TERM tier engaged (consolidation asserted during the "
            "run).  Detections come from a ground-truth-backed stub detector "
            "with dilate/erode noise (no trained detector exists at this "
            "geometry in-env).  Mean per-frame IoU vs GT over frames 1..T-1.\n"
            f"Checkpoint: `{os.path.relpath(args.weights, REPO)}`.\n"
            "Generated by `tools/eval_tracker_quality.py --serving` "
            "(VERDICT.md round-2 item 3).\n\n"
            "| config | mean IoU |\n|---|---|\n"
        )
        for name, iou in rows:
            f.write(f"| {name} | {iou:.3f} |\n")
    print(json.dumps({
        "metric": "tracker serving-scale IoU (quarter geometry, serving API)",
        "rows": [{"config": n, "iou": round(i, 4)} for n, i in rows],
    }))


if __name__ == "__main__":
    main()
