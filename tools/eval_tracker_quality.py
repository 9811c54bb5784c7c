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


def make_realistic_clip(rng, T, h, w, shrink=True):
    """Needle-like rotated bar over textured drifting background.

    Returns images (T, h, w, 3) float[0,1], masks (T, 1, h, w) float{0,1}."""
    # textured background: smoothed noise + gradient, drifting
    base = rng.uniform(0.2, 0.6, size=(h + 40, w + 40, 3)).astype(np.float32)
    k = np.ones((9, 9), np.float32) / 81.0
    for c in range(3):
        from scipy.signal import convolve2d

        base[..., c] = convolve2d(base[..., c], k, mode="same", boundary="symm")
    gy = np.linspace(0, 0.15, h + 40)[:, None, None]
    base = np.clip(base + gy, 0, 1)

    cx, cy = w * rng.uniform(0.35, 0.65), h * rng.uniform(0.35, 0.65)
    angle = rng.uniform(-0.5, 0.5)
    length = min(h, w) * rng.uniform(0.55, 0.8)
    width = max(3.0, min(h, w) * 0.06)
    vx, vy = rng.uniform(-2.0, 2.0), rng.uniform(-1.5, 1.5)
    va = rng.uniform(-0.02, 0.02)
    color = rng.uniform(0.75, 0.95, size=3)

    images = np.zeros((T, h, w, 3), np.float32)
    masks = np.zeros((T, 1, h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for t in range(T):
        ox, oy = int(2 * t) % 40, int(1 * t) % 40
        img = base[oy:oy + h, ox:ox + w].copy()
        img *= rng.uniform(0.92, 1.08)  # illumination jitter
        a = angle + va * t
        ca, sa = np.cos(a), np.sin(a)
        lcur = length * (1.0 - (0.04 * t if shrink else 0.0))
        u = (xx - (cx + vx * t)) * ca + (yy - (cy + vy * t)) * sa
        v = -(xx - (cx + vx * t)) * sa + (yy - (cy + vy * t)) * ca
        m = (np.abs(u) < lcur / 2) & (np.abs(v) < width / 2)
        img[m] = color * rng.uniform(0.95, 1.05)
        images[t] = np.clip(img, 0, 1)
        masks[t, 0] = m.astype(np.float32)
    return images, masks


def _iou(pred_slot, gt):
    inter = (pred_slot & gt).sum()
    union = (pred_slot | gt).sum()
    return float(inter / union) if union else float("nan")


def eval_config(name, core, clips, window=0, pyramid_fn=None):
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
    jit_win = jax.jit(core.propagate_frames, static_argnames=("window",))

    for images, masks in clips:
        T = images.shape[0]
        onehot0 = np.zeros((No, *images.shape[1:3]), np.float32)
        onehot0[0] = masks[0, 0]
        obj_valid = np.zeros((No,), bool)
        obj_valid[0] = True

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
                mem, ids_s4 = jit_win(
                    core.variables, mem,
                    keys[t:e], {k: v[t:e] for k, v in skips.items()},
                    window=e - t,
                )
                ids = np.repeat(np.repeat(np.asarray(ids_s4), 4, 1), 4, 2)
                for j in range(e - t):
                    pred = ids[j][: images.shape[1], : images.shape[2]] == 1
                    v = _iou(pred, masks[t + j, 0] > 0.5)
                    if not np.isnan(v):
                        ious.append(v)
                t = e
        else:
            for t in range(1, T):
                prob, mem = jit_step(
                    core.variables, mem, keys[t],
                    {k: v[t] for k, v in skips.items()},
                )
                pred = np.asarray(jnp.argmax(prob, 0)) == 1
                v = _iou(pred, masks[t, 0] > 0.5)
                if not np.isnan(v):
                    ious.append(v)
    return float(np.mean(ious)) if ious else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--clips", type=int, default=4)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--weights", default=os.path.join(
        REPO, "resources", "weights", "tracker_propagation.msgpack"))
    ap.add_argument("--shared-weights", default=os.path.join(
        REPO, "resources", "weights", "tracker_shared.msgpack"))
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "tracker_quality.md"))
    args = ap.parse_args()

    from yolo_puncture_tpu.track.core import TrackerCore
    from yolo_puncture_tpu.track.train import make_yolo_pyramid_fn, pyramid_channels_for

    rng = np.random.default_rng(args.seed)
    clips = [
        make_realistic_clip(rng, args.frames, args.height, args.width)
        for _ in range(args.clips)
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
        ("window4", core_of(), dict(window=4)),
        ("subpix_tail", core_of(subpix_tail=True), dict()),
        ("int8 memory", core_of(quantized_memory=True), dict()),
    ]
    if args.quick:
        configs = configs[:2]
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
            f"Protocol: {args.clips} held-out realistic clips ({args.frames} frames @ "
            f"{args.height}×{args.width}), textured drifting background, rotated "
            "shrinking needle-like object — outside the moving-bar training "
            "distribution.  Propagate from frame-0 GT; mean per-frame IoU vs GT.\n"
            f"Checkpoint: `{os.path.relpath(args.weights, REPO)}`.\n"
            "Generated by `tools/eval_tracker_quality.py` "
            "(VERDICT.md round-1 item 4).\n\n"
            "| config | mean IoU | Δ vs base |\n|---|---|---|\n"
        )
        for name, iou, d in rows:
            f.write(f"| {name} | {iou:.3f} | {d:+.3f} |\n")
    print(json.dumps({
        "metric": "tracker propagation IoU (realistic holdout)",
        "rows": [{"config": n, "iou": round(i, 4), "delta": round(d, 4)}
                 for n, i, d in rows],
    }))


if __name__ == "__main__":
    main()
