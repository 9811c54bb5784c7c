"""Train-time augmentation (mosaic / affine / flip / HSV) geometry tests.

The reference delegates training to the ultralytics CLI whose default
augmentations are mosaic=1.0, scale=0.5, translate=0.1, fliplr=0.5 and HSV
jitter (SURVEY §2.2 "YOLO train/val CLI").  Here the same capability lives in
``train/data.SegDataset.sample``; these tests pin that pixels and label
polygons go through the SAME transform: wherever the white target lands in
the augmented image, the rasterized gt mask must land too.
"""

import numpy as np
import pytest

from yolo_puncture_tpu.train.data import SegDataset

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("augds")
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(4):
        h, w = int(rng.integers(80, 128)), int(rng.integers(80, 128))
        img = np.zeros((h, w, 3), np.uint8)
        # one solid white rectangle per image, away from the borders
        x1, y1 = int(rng.integers(8, w // 3)), int(rng.integers(8, h // 3))
        x2, y2 = int(rng.integers(2 * w // 3, w - 4)), int(rng.integers(2 * h // 3, h - 4))
        img[y1:y2, x1:x2] = 255
        cv2.imwrite(str(root / "images" / "train" / f"im{i}.jpg"), img)
        poly = np.array(
            [[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32
        ) / np.array([w, h], np.float32)
        line = "0 " + " ".join(f"{v:.6f}" for v in poly.reshape(-1))
        (root / "labels" / "train" / f"im{i}.txt").write_text(line + "\n")
    return str(root)


def _mask_image_iou(item, imgsz):
    """IoU between white pixels of the augmented image and the gt masks."""
    white = (item["images"].mean(-1) > 0.6).astype(np.float32)
    white4 = cv2.resize(white, (imgsz // 4, imgsz // 4), interpolation=cv2.INTER_AREA) > 0.5
    union_mask = (item["gt_masks"][item["mask_gt"]].sum(0) > 0.5) if item["mask_gt"].any() else np.zeros_like(white4)
    inter = np.logical_and(white4, union_mask).sum()
    union = np.logical_or(white4, union_mask).sum()
    return inter / max(union, 1)


def test_affine_only_geometry(dataset_root):
    ds = SegDataset(
        dataset_root, imgsz=64, max_boxes=8, seed=7,
        mosaic=0.0, scale=0.5, translate=0.1, fliplr=0.5,
        hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
    )
    hits = 0
    for trial in range(8):
        item = ds.sample(trial % len(ds))
        assert item["images"].shape == (64, 64, 3)
        if item["mask_gt"].any():
            hits += 1
            assert _mask_image_iou(item, 64) > 0.55
            m = item["mask_gt"]
            b = item["gt_bboxes"][m]
            assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
            assert (b >= 0).all() and (b <= 64).all()
    assert hits >= 4  # scale jitter can push the target off-canvas sometimes


def test_mosaic_geometry(dataset_root):
    ds = SegDataset(
        dataset_root, imgsz=64, max_boxes=16, seed=11,
        mosaic=1.0, scale=0.5, translate=0.1, fliplr=0.5,
        hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
    )
    multi = 0
    for trial in range(8):
        item = ds.sample(trial % len(ds))
        if item["mask_gt"].sum() >= 2:
            multi += 1
        if item["mask_gt"].any():
            assert _mask_image_iou(item, 64) > 0.5
    assert multi >= 2  # mosaic should regularly show more than one object


def test_hsv_jitter_changes_pixels_not_labels(dataset_root):
    a = SegDataset(dataset_root, imgsz=64, seed=5, mosaic=0.0, scale=0.0,
                   translate=0.0, fliplr=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0)
    b = SegDataset(dataset_root, imgsz=64, seed=5, mosaic=0.0, scale=0.0,
                   translate=0.0, fliplr=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4)
    ia, ib = a.sample(0), b.sample(0)
    assert np.array_equal(ia["gt_bboxes"], ib["gt_bboxes"])
    assert np.array_equal(ia["gt_masks"], ib["gt_masks"])
    assert not np.array_equal(ia["images"], ib["images"])


def test_seed_determinism_and_batches(dataset_root):
    kw = dict(imgsz=64, max_boxes=8)
    d1 = SegDataset(dataset_root, seed=42, **kw)
    d2 = SegDataset(dataset_root, seed=42, **kw)
    b1 = next(d1.batches(2))
    b2 = next(d2.batches(2))
    for k in b1:
        assert np.array_equal(b1[k], b2[k]), k
    assert b1["images"].shape == (2, 64, 64, 3)
    assert b1["gt_masks"].shape == (2, 8, 16, 16)


def test_close_mosaic_window(dataset_root, monkeypatch):
    """fit() turns mosaic off for the final close_mosaic epochs — and only
    when the run is longer than the window (ultralytics trigger semantics)."""
    from yolo_puncture_tpu.train.trainer import Trainer

    tr = Trainer.__new__(Trainer)  # no model needed: step fns stubbed out
    seen = []

    def fake_step(state, batch):
        return state, {}

    monkeypatch.setattr(tr, "train_step", fake_step, raising=False)

    class Probe(SegDataset):
        def batches(self, batch_size, shuffle=True):
            seen.append(self.mosaic)
            yield {"images": np.zeros((1, 64, 64, 3), np.float32)}

    monkeypatch.setattr(
        Trainer, "init_state", lambda self, batch: type("S", (), {"step": 0})()
    )
    ds = Probe(dataset_root, imgsz=64, seed=0, mosaic=1.0)
    tr.mesh = None
    tr._step_fn = fake_step
    Trainer.fit(tr, ds, epochs=12, batch_size=1, log_every=10**9, close_mosaic=10)
    assert seen[:2] == [1.0, 1.0] and all(m == 0.0 for m in seen[2:])

    seen.clear()
    ds2 = Probe(dataset_root, imgsz=64, seed=0, mosaic=1.0)
    Trainer.fit(tr, ds2, epochs=5, batch_size=1, log_every=10**9, close_mosaic=10)
    assert all(m == 1.0 for m in seen)  # run shorter than window: never closes


def test_augment_false_is_letterbox_parity(dataset_root):
    ds = SegDataset(dataset_root, imgsz=64, augment=False, seed=0)
    a, b = ds.sample(1), ds.load(1)
    for k in a:
        assert np.array_equal(a[k], b[k]), k
