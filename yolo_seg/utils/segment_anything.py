"""yolo_seg/utils/segment_anything.py surface (reference :12-89): SAM automatic
mask generation + matplotlib inspection helpers."""

import numpy as np

from yolo_puncture_tpu.utils.sam_wrapper import segment_anything, show_anns  # noqa: F401

__all__ = ["segment_anything", "show_anns", "show_mask", "show_points", "show_box"]


def show_mask(mask, ax):
    """Overlay one boolean mask on a matplotlib axis (reference :12-16)."""
    h, w = mask.shape[-2:]
    rgba = np.zeros((h, w, 4), dtype=np.float32)
    rgba[..., :3] = np.array([30, 144, 255], np.float32) / 255.0
    rgba[..., 3] = np.reshape(mask, (h, w)).astype(np.float32) * 0.6
    ax.imshow(rgba)


def show_points(coords, labels, ax, marker_size=375):
    """Green stars = positive prompts, red = negative (reference :19-25)."""
    coords = np.asarray(coords)
    labels = np.asarray(labels)
    for value, color in ((1, "green"), (0, "red")):
        pts = coords[labels == value]
        ax.scatter(
            pts[:, 0], pts[:, 1], color=color, marker="*", s=marker_size,
            edgecolor="white", linewidth=1.25,
        )


def show_box(box, ax):
    """Draw an xyxy box outline (reference :28-31)."""
    import matplotlib.pyplot as plt

    x0, y0 = box[0], box[1]
    ax.add_patch(
        plt.Rectangle(
            (x0, y0), box[2] - x0, box[3] - y0,
            edgecolor="green", facecolor=(0, 0, 0, 0), lw=2,
        )
    )
