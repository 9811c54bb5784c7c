from yolo_puncture_tpu.utils.config import get_config, load_config, Config  # noqa: F401
