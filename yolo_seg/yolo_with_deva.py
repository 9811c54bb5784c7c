"""yolo_seg/yolo_with_deva.py surface (reference :37-262): YOLO detections
driving DEVA-style temporal mask propagation.

``auto_segment`` / ``process_frame`` delegate to the CLI implementation
(apps/track_video.py, semionline + online schedulers).  ``estimate_forward_mask``
(reference :91-100) propagates the current memory onto a new frame WITHOUT
committing state — here one jitted readout whose updated memory is discarded."""

import numpy as np

from apps.track_video import auto_segment, process_frame  # noqa: F401

__all__ = ["auto_segment", "process_frame", "estimate_forward_mask"]


def estimate_forward_mask(deva, image):
    """Peek propagation: argmax id mask for ``image`` from the tracker's current
    memory, leaving ``deva`` (a TrackerCore) unchanged (reference :91-100)."""
    img = deva._prep_image(np.asarray(image))
    prob, _discarded_memory = deva._jit_step(deva.variables, deva.memory, img)
    return np.argmax(np.asarray(prob), axis=0)
