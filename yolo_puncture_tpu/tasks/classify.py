"""Insertion-state classifier task (EfficientNet-B3 / VAN).

API contract from yolo_seg/tasks/needle_clasify.py:
  * ``load_classify_net`` (:64-65) — build 2-class classifier, optionally from a
    timm ``.pth.tar`` checkpoint.
  * ``predict_images`` (:68-97) — batch of RGB crops → (class indices, max probs):
    resize 380², ImageNet normalize, softmax over 2 classes.
  * ``predict_and_find_start_inserted`` (:132-199) — per-frame 380² crops around
    the detected boxes → batched classification → sliding-window key-frame search
    → sequence repair.  Returns (class_list, prob_list, insert_frame_index).

TPU-native: preprocessing (resize + normalize) fuses with the forward into one
jitted program; frames are classified in fixed-size batches (pad last batch) so a
video is a handful of device calls instead of N//4 (reference batch_size=4).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_puncture_tpu.models.efficientnet import preprocess_classifier
from yolo_puncture_tpu.registry import create_model
from yolo_puncture_tpu.analytics.keyframe import find_insert_start, fix_class_prob
from yolo_puncture_tpu.utils.transform import crop_frames_batch

INPUT_IMG_SIZE = 380  # needle_clasify.py:21
NUM_CLASSES = 2       # needle_clasify.py:20


class ClassifierNet:
    """Model + params + jitted forward, with the predict_images contract."""

    def __init__(
        self,
        model_name: str = "efficientnet_b3",
        checkpoint: Optional[str] = None,
        num_classes: int = NUM_CLASSES,
        input_size: int = INPUT_IMG_SIZE,
        dtype=jnp.float32,
        seed: int = 0,
    ):
        self.model = create_model(model_name, num_classes=num_classes, dtype=dtype)
        self.input_size = input_size
        x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
        self.variables = jax.jit(self.model.init)(jax.random.PRNGKey(seed), x)
        if checkpoint:
            from yolo_puncture_tpu.utils.torch_convert import (
                convert_classifier_state_dict,
                extract_state_dict,
            )

            sd = extract_state_dict(checkpoint)
            self.variables, _ = convert_classifier_state_dict(sd, self.variables)

        @jax.jit
        def _forward(variables, images_u8):
            x = preprocess_classifier(images_u8, self.input_size, dtype)
            logits = self.model.apply(variables, x)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.argmax(probs, axis=-1), jnp.max(probs, axis=-1), probs

        self._forward = _forward

    def predict(self, images_rgb_u8: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(B, H, W, 3) RGB uint8 → (indices, max-probs)."""
        idx, p, _ = self._forward(self.variables, jnp.asarray(images_rgb_u8))
        return np.asarray(idx), np.asarray(p)


def load_classify_net(
    checkpoint_name: Optional[str] = None,
    name: str = "efficientnet_b3",
    num_classes: int = NUM_CLASSES,
    **kw,
) -> ClassifierNet:
    return ClassifierNet(name, checkpoint=checkpoint_name, num_classes=num_classes, **kw)


def predict_images(model: ClassifierNet, images: Sequence[np.ndarray]):
    """List of RGB ndarrays (any size) → (indices list, probabilities list)."""
    import cv2

    resized = np.stack(
        [
            cv2.resize(im, (model.input_size, model.input_size), interpolation=cv2.INTER_LINEAR)
            if im.shape[:2] != (model.input_size, model.input_size)
            else im
            for im in images
        ]
    )
    idx, p = model.predict(resized)
    return idx.tolist(), p.tolist()


def predict_and_find_start_inserted(
    model: ClassifierNet,
    frames: Optional[Sequence[np.ndarray]] = None,
    boxes_list: Optional[Sequence] = None,
    judge_wnd: int = 20,
    batch_size: int = 64,
) -> Tuple[List[int], List[float], int]:
    """Frames (BGR, cv2 convention like the reference) + boxes → classes/probs/key frame."""
    frames = list(frames or [])
    boxes_list = list(boxes_list or [])
    if len(frames) != len(boxes_list):
        raise ValueError("The length of frames and boxes_list must be the same.")
    if not frames:
        return [], [], 0

    # center-crop 380² around each box, then BGR→RGB on the crops only
    # (needle_clasify.py:151-154 semantics; flipping/stacking whole frames
    # first would materialize a full copy of the video — ~2.7 GB for
    # 1000×720p frames; the crop loop reads the original frames in place)
    crops = crop_frames_batch(frames, np.asarray(boxes_list), model.input_size)[..., ::-1]

    class_list: List[int] = []
    prob_list: List[float] = []
    n = len(crops)
    for i in range(0, n, batch_size):
        batch = crops[i : i + batch_size]
        if len(batch) < batch_size and n > batch_size:
            # pad to the compiled batch size; drop padded outputs
            pad = batch_size - len(batch)
            padded = np.concatenate([batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)])
            idx, p = model.predict(padded)
            idx, p = idx[: len(batch)], p[: len(batch)]
        else:
            idx, p = model.predict(batch)
        class_list.extend(int(v) for v in idx)
        prob_list.extend(float(v) for v in p)

    insert_frame_index = find_insert_start(class_list, prob_list, judge_wnd)
    class_list, prob_list = fix_class_prob(class_list, prob_list, insert_frame_index)
    return class_list, prob_list, insert_frame_index
