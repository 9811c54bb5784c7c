from yolo_puncture_tpu.analytics.keyframe import (  # noqa: F401
    find_insert_start,
    fix_class_prob,
)
from yolo_puncture_tpu.analytics.speed import (  # noqa: F401
    insertion_state_machine,
    insertion_state_machine_jax,
    SpeedResult,
)
from yolo_puncture_tpu.analytics.stats import (  # noqa: F401
    remove_outliers,
    calculate_speed_mm,
    compute_pixel_to_mm_ratio,
    compute_metrics,
)
