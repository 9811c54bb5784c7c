"""yolo_puncture_tpu — a TPU-native (JAX/XLA/Pallas/pjit) needle-puncture video-analysis
framework with the capabilities of daisy9542/yolo-puncture.

Layering (bottom-up):
  nn/        core conv/attention blocks and detection/segmentation heads (flax.linen, NHWC)
  models/    model zoo: YOLO v8/v10/v11 det+seg, EfficientNet, U2Net, VAN, SAM
  ops/       device ops (letterbox, NMS, proto-mask decode, smoothing) + Pallas kernels
  predict/   ultralytics-compatible Predictor / Results / Boxes / Masks API
  track/     DEVA-style temporal mask propagation (ring-buffer memory attention)
  analytics/ needle-speed analytics (key-frame search, insertion state machine)
  pipeline/  video IO + fused batched on-device pipeline runner
  train/     fine-tune loop (TAL / v10 dual assignment), losses, mAP metrics
  parallel/  device-mesh + sharding helpers (pjit / shard_map over ICI)
  utils/     config, torch-checkpoint converters, transforms
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # The axon TPU plugin force-registers itself at `import jax` and IGNORES
    # the JAX_PLATFORMS env var; honor the var here (before any backend use)
    # so every entry point — apps/, tools/, plain `import yolo_puncture_tpu`
    # — can be forced onto CPU with the documented env var.  No-op unless the
    # user set it explicitly.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

from yolo_puncture_tpu.utils.config import get_config  # noqa: F401
from yolo_puncture_tpu.registry import create_model, register_model, list_models  # noqa: F401

# Populate the registry.
from yolo_puncture_tpu import models as _models  # noqa: E402,F401


def __getattr__(name):
    # lazy top-level conveniences (avoid importing the predict stack eagerly)
    if name == "YOLO":
        from yolo_puncture_tpu.predict import YOLO

        return YOLO
    raise AttributeError(name)
