"""yolo_seg/tasks/needle_clasify.py surface (reference :15-199): EfficientNet-B3
insertion classifier + key-frame search.

``load_classify_net`` keeps the reference behavior of resolving
``checkpoint_name`` under ``CONFIG.PATH.WEIGHTS_PATH`` (reference :64-65) and of
deriving the timm model name — here any registry name embedded in the filename
(efficientnet_b*/van_b*) is honored, defaulting to efficientnet_b3 like the
reference.  A missing checkpoint falls back to random init with a stderr
warning (framework-wide convention; the reference raises inside timm)."""

import os
import re
import sys

from yolo_puncture_tpu.analytics.keyframe import fix_class_prob  # noqa: F401
from yolo_puncture_tpu.tasks.classify import (  # noqa: F401
    INPUT_IMG_SIZE,
    NUM_CLASSES,
    predict_and_find_start_inserted,
    predict_images,
)
from yolo_puncture_tpu.tasks.classify import load_classify_net as _load_classify_net
from yolo_puncture_tpu.utils.config import get_config

__all__ = [
    "load_classify_net",
    "predict_images",
    "predict_and_find_start_inserted",
    "fix_class_prob",
    "NUM_CLASSES",
    "INPUT_IMG_SIZE",
]


def load_classify_net(checkpoint_name=None, device=None, name=None):
    # the reference's own dev_tools/auto_speed_calc.py:86 calls this as
    # load_classify_net(name=<ckpt>) although the reference signature is
    # (checkpoint_name, device) — accept both conventions
    if checkpoint_name is None:
        if name is None:
            raise TypeError("load_classify_net needs a checkpoint name")
        checkpoint_name = name
    cfg = get_config()
    path = os.path.join(cfg.PATH.WEIGHTS_PATH, checkpoint_name)
    name_match = re.search(r"(efficientnet_b\d|van_b\d)", os.path.basename(checkpoint_name))
    model_name = name_match.group(1) if name_match else "efficientnet_b3"
    if not os.path.exists(path):
        print(
            f"WARNING: classifier checkpoint {path} not found — random init",
            file=sys.stderr,
        )
        path = None
    return _load_classify_net(path, name=model_name)
