"""yolo_seg/utils/config.py surface (reference :7-26): YAML-backed attribute
config singleton.  Delegates to the framework's dataclass tree, which exposes
the same ``CONFIG.PATH.DATASETS_PATH`` / ``CONFIG.PATH.WEIGHTS_PATH`` keys."""

from yolo_puncture_tpu.utils.config import get_config  # noqa: F401

__all__ = ["get_config"]
