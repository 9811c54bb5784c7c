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
    ap.add_argument("--serve_frames", type=int, default=128)
    ap.add_argument("--serve_clips", type=int, default=2)
    ap.add_argument("--detector", default=None,
                    help="REAL trained detector for the serving protocol: an "
                    "orbax checkpoint dir (yolo_cli train output) or msgpack "
                    "(VERDICT r3 item 4 — detector-in-the-loop rows)")
    ap.add_argument("--det_arch", default="yolo10s-seg")
    ap.add_argument("--det_imgsz", type=int, default=640)
    ap.add_argument("--det_conf", type=float, default=0.5,
                    help="detection operating point for the real-detector "
                    "protocol (auto_segment's hardcoded 0.9 assumes the "
                    "reference checkpoint's confidence scale)")
    ap.add_argument("--det_ema", action="store_true",
                    help="use the checkpoint's EMA params (yolo_cli val "
                    "use_ema=true — the better-mAP variant, bench_matrix_r4)")
    ap.add_argument("--serve_size", type=int, default=640,
                    help="real-detector protocol clip geometry (square)")
    ap.add_argument("--serve_tracker_size", type=int, default=480)
    ap.add_argument("--serve_long_frames", type=int, default=400)
    ap.add_argument("--serve_batched", action="store_true",
                    help="drive process_video_batched instead of per-frame")
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
        return serving_eval_real(args) if args.detector else serving_eval(args)

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
# Serving-scale protocol (VERDICT r2 item 3 / r3 item 4): serving geometry,
# long clips, driven through the REAL serving entry points — the
# apps/track_video scheduler (auto_segment → add_to_temporary_buffer →
# vote_in_temporary_buffer → incorporate_detection → step/step_batch) with
# semionline voting and the long-term tier engaged.  With ``--detector`` the
# detections come from the REAL trained YOLO (orbax dir or msgpack) on
# 640² synth640-style clips; without it, the r3 ground-truth stub remains.
# ---------------------------------------------------------------------------


def make_serving_video(rng, T, size=640, n_needles=1, occluder=False,
                       disappear_at=None):
    """Animated synth640-style scene (tools/make_synth_dataset.make_frame
    distribution: textured background, skin band, bright rotated needle
    shafts) — the distribution the serving-scale detector trains on, so a
    REAL trained yolo10s-seg can drive the scheduler (VERDICT r3 item 4).

    Needles insert over time (shaft shrinks after a per-needle key frame) and
    drift laterally.  ``occluder=True`` sweeps a dark ellipse across the
    scene (natural missed-detection stretches: the detector cannot see the
    occluded shaft).  ``disappear_at=t``: needle 0 is fully withdrawn from
    frame t on (its GT mask goes empty — exercises the
    max_missed_detection_count deletion path).

    Returns (frames BGR uint8 (T, size, size, 3), masks (T, K, size, size)).
    """
    import cv2

    bg = rng.integers(55, 125, size=(size, size, 3), dtype=np.uint8)
    bg = cv2.GaussianBlur(bg, (0, 0), 3)
    skin_y = int(size * rng.uniform(0.62, 0.78))
    skin = np.zeros((size - skin_y, size, 3), np.uint8)
    skin[..., :] = (
        int(rng.uniform(120, 150)), int(rng.uniform(130, 165)),
        int(rng.uniform(170, 205)),
    )
    bg = bg.copy()
    bg[skin_y:] = cv2.addWeighted(bg[skin_y:], 0.25, skin, 0.75, 0)

    needles = []
    for k in range(n_needles):
        L0 = size * rng.uniform(0.22, 0.38)
        needles.append(dict(
            L0=L0,
            W=size * rng.uniform(0.016, 0.028),
            cx=size * ((0.5 + k) / n_needles * 0.6 + rng.uniform(0.08, 0.25)),
            theta=rng.uniform(np.radians(55), np.radians(125)),
            key=int(rng.integers(max(T // 6, 4), max(T // 3, 8))),
            # insertion: shrink to ~35-60% of L0 by clip end
            rate=L0 * rng.uniform(0.4, 0.65) / T,
            drift=rng.uniform(-0.25, 0.25),
            color=tuple(int(v) for v in rng.integers(215, 250, 3)),
        ))
    if occluder:
        occ = dict(cy=skin_y * rng.uniform(0.55, 0.9),
                   ry=size * rng.uniform(0.10, 0.16),
                   rx=size * rng.uniform(0.08, 0.12))

    frames = np.zeros((T, size, size, 3), np.uint8)
    masks = np.zeros((T, n_needles, size, size), np.float32)
    for t in range(T):
        img = bg.copy()
        gain = rng.uniform(0.95, 1.05)
        img = np.clip(img.astype(np.float32) * gain, 0, 255).astype(np.uint8)
        for k, nd in enumerate(needles):
            if disappear_at is not None and k == 0 and t >= disappear_at:
                continue
            L = max(nd["L0"] - nd["rate"] * max(t - nd["key"], 0),
                    0.08 * size)
            cx = nd["cx"] + nd["drift"] * t
            cy = skin_y - L * 0.35
            d = np.array([np.cos(nd["theta"]), np.sin(nd["theta"])])
            nrm = np.array([-d[1], d[0]])
            c = np.array([cx, cy])
            corners = np.stack([
                c - d * L / 2 - nrm * nd["W"] / 2,
                c - d * L / 2 + nrm * nd["W"] / 2,
                c + d * L / 2 + nrm * nd["W"] / 2,
                c + d * L / 2 - nrm * nd["W"] / 2,
            ])
            corners = np.clip(corners, 2, size - 3).astype(np.int32)
            cv2.fillPoly(img, [corners], nd["color"])
            m = np.zeros((size, size), np.uint8)
            cv2.fillPoly(m, [corners], 1)
            masks[t, k] = m
        if occluder:
            # sweep left→right, on screen roughly the middle half of the clip
            ocx = int(size * (-0.25 + 1.5 * t / max(T - 1, 1)))
            cv2.ellipse(img, (ocx, int(occ["cy"])),
                        (int(occ["rx"]), int(occ["ry"])), 0, 0, 360,
                        (25, 20, 30), -1)
            yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
            om = (((xx - ocx) / occ["rx"]) ** 2
                  + ((yy - occ["cy"]) / occ["ry"]) ** 2) < 1.0
            masks[t][:, om] = 0
        frames[t] = cv2.GaussianBlur(img, (0, 0), 0.6)
    return frames, masks


class _ConfAdapter:
    """Wrap a YOLO predictor, overriding the conf the scheduler hardcodes.

    auto_segment calls ``predict(..., conf=0.9)`` (the reference's fixed
    operating point, yolo_with_deva.py:59); a freshly-trained detector's
    confidence scale need not match the reference checkpoint's, so the eval
    pins the operating point explicitly and records it."""

    def __init__(self, det, conf, imgsz):
        self.det, self.conf, self.imgsz = det, conf, imgsz
        self.calls = 0
        self.hits = 0

    def predict(self, image, **kw):
        kw["conf"] = self.conf
        kw["imgsz"] = self.imgsz
        self.calls += 1
        out = self.det.predict(image, **kw)
        if out[0].masks is not None and len(out[0].masks) > 0:
            self.hits += 1
        return out


def _load_detector(path, arch, nc=1, use_ema=False):
    """YOLO from an orbax checkpoint dir (yolo_cli train output) or msgpack."""
    from yolo_puncture_tpu.predict import YOLO

    if os.path.isdir(path):
        from yolo_puncture_tpu.train import Trainer

        det = YOLO(arch, nc=nc)
        restored = Trainer.load_checkpoint(path)
        params = restored["params"]
        if use_ema and restored.get("ema_params") is not None:
            params = restored["ema_params"]
        det.variables = {
            "params": params,
            "batch_stats": restored.get("batch_stats", {}),
        }
        # Platt calibration sidecar (yolo_cli calibrate): when present,
        # --det_conf is interpreted on the CALIBRATED scale — the reference's
        # fixed 0.9 (yolo_with_deva.py:59) becomes a usable operating point
        det.load_calibration(path)
        return det
    return YOLO(path if path.endswith(".msgpack") else arch, nc=nc)


def _match_ids(pred_by_t, masks, K, T):
    """Fixed GT-object → predicted-id assignment: greedy by total IoU over the
    clip (the scheduler's ids are allocation-order, not GT-order)."""
    totals = {}
    for t in range(1, T):
        ids = pred_by_t.get(t)
        if ids is None:
            continue
        for pid in np.unique(ids):
            if pid == 0:
                continue
            for k in range(K):
                gt = masks[t, k] > 0.5
                if not gt.any():
                    continue
                totals[(k, pid)] = totals.get((k, pid), 0.0) + _iou(ids == pid, gt)
    assigned, used = {}, set()
    for (k, pid), s in sorted(totals.items(), key=lambda kv: -kv[1]):
        if k in assigned or pid in used:
            continue
        assigned[k] = pid
        used.add(pid)
    return assigned


def serving_eval_real(args):
    """Serving-scale protocol with the REAL trained detector in the loop."""
    import jax.numpy as jnp

    from apps.track_video import process_frame, process_video_batched
    from yolo_puncture_tpu.track.core import TrackerCore

    S, T = args.serve_size, args.serve_frames
    det = _load_detector(args.detector, args.det_arch, use_ema=args.det_ema)
    w = args.weights if os.path.exists(args.weights) else None
    rng = np.random.default_rng(args.seed + 3)

    # clip mix: single, dual, occluded (missed-detection stretches), a
    # disappearing object (deletion path), and one LONG clip at the
    # reference's default memory knobs where the long-term enablement formula
    # (yolo_with_deva.py:242-245) turns the tier on NATURALLY.
    specs = [
        ("single-1", dict(n_needles=1), {}),
        ("single-2", dict(n_needles=1), {}),
        ("dual-1", dict(n_needles=2), {}),
        ("dual-2", dict(n_needles=2), {}),
        ("occluded", dict(n_needles=1, occluder=True), {}),
        ("disappear", dict(n_needles=2, disappear_at=T // 2),
         dict(max_missed_detection_count=3)),
        ("long-natural-LT", dict(n_needles=1), dict(
            frames=args.serve_long_frames, max_mid_term_frames=10,
            min_mid_term_frames=5, num_prototypes=128,
            max_long_term_elements=10000)),
    ]

    rows = []
    for name, clip_kw, over in specs:
        Tc = over.pop("frames", T)
        frames, masks = make_serving_video(rng, Tc, size=S, **clip_kw)
        K = masks.shape[1]
        cfg = dict(
            temporal_setting="semionline", num_voting_frames=3,
            detection_every=10, size=args.serve_tracker_size,
            suppress_small_objects=True, mem_every=4,
            max_mid_term_frames=8, min_mid_term_frames=5,
            num_prototypes=64, max_long_term_elements=256,
            exact_windows=True, det_imgsz=args.det_imgsz,
        )
        cfg.update(over)
        # natural long-term enablement — the reference formula, not a force
        formula_on = (
            Tc / (cfg["max_mid_term_frames"] - cfg["min_mid_term_frames"])
            * cfg["num_prototypes"]
        ) >= cfg["max_long_term_elements"]
        cfg["enable_long_term"] = bool(formula_on)
        from yolo_puncture_tpu.track import reference_tracker_geometry

        th, tw = reference_tracker_geometry((S, S), cfg["size"])
        core = TrackerCore(
            config=cfg, image_size=(th, tw), max_objects=4, mem_frames=8,
            variables=w, dtype=jnp.float32,
        )
        adapter = _ConfAdapter(det, args.det_conf, args.det_imgsz)
        saver = _CaptureSaver()
        if args.serve_batched:
            reader = ((frames[t], f"f{t:05d}.jpg") for t in range(Tc))
            process_video_batched(core, adapter, reader, saver)
        else:
            for t in range(Tc):
                process_frame(core, adapter, f"f{t:05d}.jpg", saver, t,
                              image_np=frames[t])
        pred_by_t = {t: saver.by_name.get(f"f{t:05d}.jpg") for t in range(Tc)}
        assigned = _match_ids(pred_by_t, masks, K, Tc)
        ious, ghost = [], []
        for t in range(1, Tc):
            ids = pred_by_t.get(t)
            if ids is None:
                continue
            for k in range(K):
                gt = masks[t, k] > 0.5
                pid = assigned.get(k)
                if not gt.any():
                    if name == "disappear" and k == 0 and pid is not None:
                        ghost.append(float((ids == pid).sum() >= 100))
                    continue
                if pid is None:
                    ious.append(0.0)
                    continue
                v = _iou(ids == pid, gt)
                if not np.isnan(v):
                    ious.append(v)
        row = dict(
            clip=name, frames=Tc, objects=K,
            iou=float(np.mean(ious)) if ious else 0.0,
            det_recall=adapter.hits / max(adapter.calls, 1),
            long_term_on=bool(formula_on),
            lt_engaged=bool(np.asarray(core.memory.lt_valid).any())
            if cfg["enable_long_term"] else False,
        )
        if name == "disappear":
            row["ghost_rate"] = float(np.mean(ghost)) if ghost else 0.0
            row["slots_after"] = len(core.object_manager.slot_to_info)
        rows.append(row)
        print(row, flush=True)

    out = os.path.join(REPO, "docs", "tracker_quality_serving.md")
    with open(out, "w") as f:
        f.write(
            "# Tracker quality at serving scale — REAL detector in the loop\n\n"
            f"Protocol (r4, VERDICT r3 item 4): synth640-style clips at "
            f"{S}² driven through the apps/track_video scheduler "
            "(auto_segment → semionline voting → incorporate_detection "
            f"every 10 frames → step propagation) with the REAL trained "
            f"detector `{args.detector}` (conf {args.det_conf}, the eval's "
            "pinned operating point — auto_segment hardcodes the reference's "
            "0.9, a confidence scale a fresh checkpoint need not match) and "
            f"tracker checkpoint `{os.path.relpath(args.weights, REPO)}` at "
            f"{args.serve_tracker_size} min-side geometry.  Mix: single/dual "
            "instance, an occluder clip (missed-detection stretches), a "
            "disappearing object (max_missed_detection_count=3 deletion), and "
            f"a {args.serve_long_frames}-frame clip at the reference's default "
            "memory knobs where the long-term formula enables the tier "
            "NATURALLY.  Mean per-frame per-object IoU vs GT.\n"
            "Generated by `tools/eval_tracker_quality.py --serving "
            "--detector …`.\n\n"
            "| clip | frames | objects | mean IoU | det recall | LT on "
            "(formula) | LT engaged | notes |\n|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            notes = ""
            if "ghost_rate" in r:
                notes = (f"ghost rate {r['ghost_rate']:.2f}, "
                         f"{r['slots_after']} slots live after deletion")
            f.write(
                f"| {r['clip']} | {r['frames']} | {r['objects']} | "
                f"{r['iou']:.3f} | {r['det_recall']:.2f} | "
                f"{'yes' if r['long_term_on'] else 'no'} | "
                f"{'yes' if r['lt_engaged'] else 'no'} | {notes} |\n"
            )
    print(json.dumps({
        "metric": "tracker serving-scale IoU (real detector, serving API)",
        "rows": rows,
    }))


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
