#!/usr/bin/env python
"""Train the temporal-propagation network on synthetic motion clips.

The reference downloads pretrained DEVA weights; this framework's TPU-native
propagation net bootstraps here instead (VOS-style recurrent training, see
yolo_puncture_tpu/track/train.py).  Saves flax-msgpack weights loadable via
``TrackerCore(variables=...)`` / apps/track_video.py --tracker_weights.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from yolo_puncture_tpu.track import TrackerCore
    from yolo_puncture_tpu.track.train import PropagationTrainer

    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--height", type=int, default=256)
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--clip_len", type=int, default=4)
    parser.add_argument("--max_objects", type=int, default=4)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--output", default="resources/weights/tracker_propagation.msgpack")
    parser.add_argument("--init", default=None, help="msgpack weights to resume from")
    parser.add_argument("--eval_clips", type=int, default=16)
    parser.add_argument(
        "--shared", action="store_true",
        help="train the shared-backbone path: PyramidAdapter + decoder against a "
        "frozen YOLO backbone pyramid (the fused-pipeline configuration; "
        "track/network.py PyramidAdapter docstring)",
    )
    parser.add_argument(
        "--detector_scale", default="s",
        help="frozen YOLO backbone scale for --shared (n/s/m/l/x)",
    )
    parser.add_argument(
        "--backbone_init", default=None,
        help="flax msgpack of TRAINED detector variables for the frozen "
        "--shared backbone (e.g. tools/e2e_accuracy_eval.py --save_det); a "
        "random backbone's features do not generalize — scale must match "
        "--detector_scale",
    )
    parser.add_argument(
        "--window_mix", type=float, default=0.0,
        help="fraction of steps trained through the WINDOWED propagation "
        "program (exposure consistency for the batched serving path); "
        "requires (clip_len-1) %% window == 0",
    )
    parser.add_argument("--window", type=int, default=4)
    parser.add_argument(
        "--clips", default="mixed", choices=["bars", "mixed", "needle"],
        help="training clip distribution: 'bars' = original axis-aligned "
        "moving bars; 'mixed' = domain-randomized (textured backgrounds, "
        "rotated shrinking needle-like objects) — closes the generalization "
        "gap measured by tools/eval_tracker_quality.py; 'needle' = "
        "serving-aligned thin-shaft puncture clips (70%) + domain-randomized "
        "(30%) — the serving-geometry fix for the thin-needle propagation "
        "collapse measured by tools/diag_serving.py (r5)",
    )
    args = parser.parse_args(argv)

    pyr_channels = (128, 256, 512)
    if args.shared:
        from yolo_puncture_tpu.track.train import pyramid_channels_for

        pyr_channels = pyramid_channels_for("v10", args.detector_scale)
    core = TrackerCore(
        image_size=(args.height, args.width),
        max_objects=args.max_objects,
        mem_frames=4,
        mem_every=1,
        enable_long_term=False,
        pyramid_adapter=args.shared,
        pyramid_channels=pyr_channels,
        variables=args.init if args.init and os.path.exists(args.init) else None,
    )
    pyramid_fn = None
    if args.shared:
        from yolo_puncture_tpu.track.train import make_yolo_pyramid_fn

        bvars = None
        if args.backbone_init:
            from flax import serialization

            from yolo_puncture_tpu.models.yolo import YOLOModel

            m = YOLOModel(version="v10", scale=args.detector_scale, nc=1,
                          task="segment")
            template = jax.jit(m.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
            with open(args.backbone_init, "rb") as f:
                bvars = serialization.from_bytes(template, f.read())
        pyramid_fn, _ = make_yolo_pyramid_fn(
            scale=args.detector_scale, seed=0, variables=bvars
        )
    clip_fn = None
    if args.clips == "mixed":
        from yolo_puncture_tpu.track.train import make_domain_randomized_clip

        clip_fn = make_domain_randomized_clip
    elif args.clips == "needle":
        from yolo_puncture_tpu.track.train import make_needle_serving_clip

        clip_fn = make_needle_serving_clip
    trainer = PropagationTrainer(
        core, lr=args.lr, clip_len=args.clip_len, batch_size=args.batch,
        pyramid_fn=pyramid_fn, clip_fn=clip_fn,
        window_mix=args.window_mix, window=args.window,
    )
    iou0 = trainer.eval_propagation_iou(args.eval_clips)
    print(f"propagation IoU before: {iou0:.3f}")
    trainer.fit(steps=args.steps, log_every=max(args.steps // 20, 1))
    iou1 = trainer.eval_propagation_iou(args.eval_clips)
    print(f"propagation IoU after: {iou1:.3f}")

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(core.variables)))
    print(f"saved {args.output}")
    return iou0, iou1


if __name__ == "__main__":
    main()
