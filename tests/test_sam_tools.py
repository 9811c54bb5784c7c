"""SAM + annotation/video tooling contracts (tiny shapes, CPU)."""

import numpy as np
import pytest


def test_sam_forward_shapes():
    import jax
    import jax.numpy as jnp

    from yolo_puncture_tpu.models.sam import SAM

    model = SAM(variant="vit_b", img_size=64)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    pts = jnp.asarray([[[0.5, 0.5]]], jnp.float32)
    lbl = jnp.ones((1, 1), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, pts, lbl)
    masks, iou = model.apply(variables, img, pts, lbl)
    assert masks.shape[0] == 1 and masks.shape[1] == 4  # 4 mask tokens
    assert masks.shape[2:] == (16, 16)  # 4× upscale of 4×4 patch grid
    assert iou.shape == (1, 4)


def test_sam_amg_generate():
    from yolo_puncture_tpu.models.sam import SamAutomaticMaskGenerator, build_sam

    # geometry is a model property now (real-SAM semantics: rel-pos tables and
    # pos_embed are sized to img_size at build time)
    sam = build_sam("vit_b", img_size=64)
    gen = SamAutomaticMaskGenerator(
        sam, points_per_side=2, points_per_batch=4,
        pred_iou_thresh=-10.0, stability_score_thresh=0.0,
        crop_n_layers=0,
    )
    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3), np.uint8)
    masks = gen.generate(img)
    for m in masks:
        assert m["segmentation"].shape == (96, 128)
        assert len(m["bbox"]) == 4
        assert m["crop_box"] == [0, 0, 128, 96]
        assert m["area"] == m["segmentation"].sum()


def test_toolbox_contracts():
    from tools.toolbox import KEY_FRAME, id_assign, sort_by_filename

    assert KEY_FRAME[1] == [122, 165] and len(KEY_FRAME) == 19
    assert id_assign(3, 42) == 3000042
    assert sort_by_filename("12frame_7.jpg") == (12, 7)
    assert sort_by_filename("noise.bin") == (0, 0)


def test_video_tools_roundtrip(tmp_path):
    import cv2

    from tools.video_tools import calculate_speed, frames2video, two_point_distance, video2frames

    vid = tmp_path / "video5.mp4"
    out = cv2.VideoWriter(str(vid), cv2.VideoWriter.fourcc(*"mp4v"), 30.0, (32, 24))
    for _ in range(4):
        out.write(np.zeros((24, 32, 3), np.uint8))
    out.release()
    n = video2frames(str(vid), str(tmp_path / "frames"))
    assert n == 4
    assert (tmp_path / "frames" / "5frame_0.jpg").exists()
    m = frames2video(str(tmp_path / "frames"), str(tmp_path / "rebuilt.mp4"))
    assert m == 4
    from tools.video_tools import extract_frames

    k = extract_frames(str(vid), str(tmp_path / "extract"))
    assert k == 4
    # per-video subdir + same frame naming (extract_frames_from_video.py:29-36)
    assert (tmp_path / "extract" / "5" / "5frame_3.jpg").exists()
    with pytest.raises(ValueError):
        extract_frames(str(tmp_path / "rebuilt.mp4"), str(tmp_path / "extract"))

    lo, hi = calculate_speed(10, 20, 40, 30, 2)
    assert lo == pytest.approx(2.0)
    assert hi == pytest.approx(6.0)  # 2mm over the 10-frame (1/3 s) min interval
    assert two_point_distance((0, 0), (3, 4)) == 5.0


def test_annotation_tools(tmp_path):
    import cv2

    from tools.annotation import polygons_to_png, render_label_overlay, tag_images

    (tmp_path / "labels").mkdir()
    (tmp_path / "labels" / "a.txt").write_text("0 0.1 0.1 0.9 0.1 0.9 0.9 0.1 0.9\n")
    n = polygons_to_png(str(tmp_path / "labels"), str(tmp_path / "masks"), 64, 48)
    assert n == 1
    png = cv2.imread(str(tmp_path / "masks" / "a.png"), cv2.IMREAD_GRAYSCALE)
    assert png.shape == (48, 64) and png.max() == 255

    img = np.zeros((48, 64, 3), np.uint8)
    over = render_label_overlay(img, str(tmp_path / "labels" / "a.txt"))
    assert over.sum() > 0

    (tmp_path / "frames").mkdir()
    cv2.imwrite(str(tmp_path / "frames" / "x.jpg"), img)
    assert tag_images(str(tmp_path / "frames"), str(tmp_path / "tagged")) == 1


def test_labeler_select_and_save(tmp_path):
    """Headless core of the click labeler: nearest-center pick + label layout
    (plot_frame_masks.py:50-66,113-121)."""
    from tools.annotation import save_selected_annotation, select_mask_by_point

    anns = [
        {"bbox": (0, 0, 10, 10), "segmentation": [0.1, 0.1, 0.2, 0.1, 0.2, 0.2]},
        {"bbox": (40, 40, 10, 10), "segmentation": [0.7, 0.7, 0.8, 0.7, 0.8, 0.8]},
    ]
    assert select_mask_by_point(anns, (3, 4)) == 0
    assert select_mask_by_point(anns, (46, 44)) == 1
    assert select_mask_by_point([], (0, 0)) == -1

    img = np.zeros((48, 64, 3), np.uint8)
    idx = select_mask_by_point(anns, (46, 44))
    label_path = save_selected_annotation(
        img, anns[idx]["segmentation"], video_num=7, frame_num=12, out_root=str(tmp_path)
    )
    assert label_path.endswith("labels/7frame_12.txt")
    assert (tmp_path / "images" / "7frame_12.jpg").exists()
    vals = (tmp_path / "labels" / "7frame_12.txt").read_text().split()
    assert vals[0] == "0" and [float(v) for v in vals[1:]] == anns[idx]["segmentation"]


def test_dataset_gen(tmp_path):
    import cv2

    from tools.dataset_gen import gen
    from yolo_puncture_tpu.predict import YOLO

    vid = tmp_path / "video7.mp4"
    out = cv2.VideoWriter(str(vid), cv2.VideoWriter.fourcc(*"mp4v"), 30.0, (64, 64))
    for _ in range(3):
        f = np.zeros((64, 64, 3), np.uint8)
        cv2.rectangle(f, (10, 28), (54, 38), (255, 255, 255), -1)
        out.write(f)
    out.release()
    model = YOLO("yolov8n-seg", nc=1)
    n = gen(model, str(vid), str(tmp_path / "ds"), mode="train", key_index=1)
    assert n == 3
    assert (tmp_path / "ds" / "images" / "train" / "7frame_0.jpg").exists()
