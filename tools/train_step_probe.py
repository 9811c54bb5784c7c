#!/usr/bin/env python
"""Probe the jitted train step at a given geometry: ms/step, HBM, loss drop.

VERDICT r3 item 8: the reference's actual training contract is
``yolo train ... imgsz=1280`` (/root/reference/docs/quickstart.md:55-64,
/root/reference/README.md:90); this tool demonstrates that geometry compiles
and runs on-chip, and records the numbers a capacity-planning doc needs:

    python tools/train_step_probe.py --data datasets/synth1280 \
        --model yolo10s-seg --imgsz 1280 --batch 2 --steps 30

Prints one JSON line: {"imgsz", "batch", "ms_per_step", "steps_per_sec",
"imgs_per_sec", "hbm_peak_gb", "loss_first", "loss_last"}.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="datasets/synth1280")
    ap.add_argument("--model", default="yolo10s-seg")
    ap.add_argument("--imgsz", type=int, default=1280)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--nc", type=int, default=1)
    ap.add_argument("--lr0", type=float, default=0.01)
    args = ap.parse_args()

    import jax

    from yolo_puncture_tpu import create_model
    from yolo_puncture_tpu.train import Trainer
    from yolo_puncture_tpu.train.data import SegDataset

    model = create_model(args.model, nc=args.nc)
    ds = SegDataset(args.data, split="train", imgsz=args.imgsz, augment=True)
    trainer = Trainer(
        model, nc=args.nc, imgsz=args.imgsz, lr0=args.lr0,
        total_steps=max(args.steps, 100), warmup_steps=10,
    )

    it = iter(ds.batches(args.batch))
    batches = []
    for _ in range(min(8, max(1, len(ds) // args.batch))):
        try:
            batches.append(next(it))
        except StopIteration:
            break

    state = trainer.init_state(batches[0])
    # compile (excluded from timing)
    t0 = time.time()
    state, metrics = trainer.train_step(state, batches[0])
    jax.block_until_ready(metrics["total"])
    compile_s = time.time() - t0
    loss_first = float(metrics["total"])

    t0 = time.time()
    for i in range(args.steps):
        state, metrics = trainer.train_step(state, batches[(i + 1) % len(batches)])
    jax.block_until_ready(metrics["total"])
    dt = time.time() - t0
    loss_last = float(metrics["total"])

    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
    print(json.dumps({
        "imgsz": args.imgsz,
        "batch": args.batch,
        "compile_s": round(compile_s, 1),
        "ms_per_step": round(1000 * dt / args.steps, 1),
        "steps_per_sec": round(args.steps / dt, 2),
        "imgs_per_sec": round(args.steps * args.batch / dt, 1),
        "hbm_peak_gb": round(peak / 2**30, 2),
        "loss_first": round(loss_first, 3),
        "loss_last": round(loss_last, 3),
    }))


if __name__ == "__main__":
    main()
