#!/usr/bin/env python
"""Generate a synthetic needle-puncture SegDataset at serving resolution.

Writes the YOLO-seg layout SegDataset consumes (images/{split}/*.jpg +
labels/{split}/*.txt, one ``class x1 y1 x2 y2 …`` normalized polygon per
line) with frames that mirror the E2E protocol's content at full 640²
serving resolution: textured background, skin band, one bright needle shaft
(rotated rectangle → exact 4-corner polygon label).  Used by the round-3
train-at-scale datapoint (VERDICT r2 item 9):

    python tools/make_synth_dataset.py --out datasets/synth640 --train 160 --val 40
    python apps/yolo_cli.py train data=datasets/synth640 model=yolo10s-seg \
        imgsz=640 epochs=40 batch=8 project=runs/synth640
    python apps/yolo_cli.py val data=datasets/synth640 model=runs/synth640 imgsz=640
"""

import argparse
import os

import numpy as np


def make_frame(rng, size=640):
    """One frame + its needle polygon (4 corners, pixel coords)."""
    import cv2

    img = rng.integers(55, 125, size=(size, size, 3), dtype=np.uint8)
    img = cv2.GaussianBlur(img, (0, 0), 3)
    # skin band at the bottom third (reference footage composition)
    skin_y = int(size * rng.uniform(0.62, 0.78))
    skin = np.full((size - skin_y, size, 3), 0, np.uint8)
    skin[..., :] = (
        int(rng.uniform(120, 150)), int(rng.uniform(130, 165)), int(rng.uniform(170, 205))
    )
    img[skin_y:] = cv2.addWeighted(img[skin_y:], 0.25, skin, 0.75, 0)

    # needle shaft: bright rotated rectangle above/entering the skin
    L = size * rng.uniform(0.18, 0.38)
    W = size * rng.uniform(0.012, 0.028)
    cx = size * rng.uniform(0.2, 0.8)
    cy = skin_y - L * rng.uniform(0.1, 0.5)
    theta = rng.uniform(np.radians(50), np.radians(130))  # mostly downward
    d = np.array([np.cos(theta), np.sin(theta)])
    n = np.array([-d[1], d[0]])
    c = np.array([cx, cy])
    corners = np.stack([
        c - d * L / 2 - n * W / 2,
        c - d * L / 2 + n * W / 2,
        c + d * L / 2 + n * W / 2,
        c + d * L / 2 - n * W / 2,
    ])
    corners = np.clip(corners, 2, size - 3)
    color = tuple(int(v) for v in rng.integers(215, 250, 3))
    cv2.fillPoly(img, [corners.astype(np.int32)], color)
    # slight highlight + blur for realism
    img = cv2.GaussianBlur(img, (0, 0), 0.6)
    return img, corners / size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="datasets/synth640")
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--train", type=int, default=160)
    ap.add_argument("--val", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    import cv2

    rng = np.random.default_rng(args.seed)
    for split, n in (("train", args.train), ("val", args.val)):
        idir = os.path.join(args.out, "images", split)
        ldir = os.path.join(args.out, "labels", split)
        os.makedirs(idir, exist_ok=True)
        os.makedirs(ldir, exist_ok=True)
        for i in range(n):
            img, poly = make_frame(rng, args.size)
            cv2.imwrite(os.path.join(idir, f"{split}_{i:04d}.jpg"), img)
            coords = " ".join(f"{v:.6f}" for v in poly.reshape(-1))
            with open(os.path.join(ldir, f"{split}_{i:04d}.txt"), "w") as f:
                f.write(f"0 {coords}\n")
        print(f"{split}: {n} images → {idir}")


if __name__ == "__main__":
    main()
