"""U²-Net mask-refinement task.

API contract from yolo_seg/tasks/unet_segment.py:
  * ``load_unet`` (:32-48) — 'u2net' or 'u2netp', weights from a raw state_dict.
  * ``unet_predict`` (:53-74) — BGR frame → fused output d1 → min-max normalize →
    threshold 0.5 → uint8 {0, 255} mask at input resolution.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_puncture_tpu.models.u2net import U2Net, norm_pred


class UNetPredictor:
    def __init__(self, model_name: str = "u2netp", checkpoint: Optional[str] = None,
                 dtype=jnp.float32, seed: int = 0):
        if model_name == "u2net":
            self.model = U2Net(small=False, dtype=dtype)
        elif model_name == "u2netp":
            self.model = U2Net(small=True, dtype=dtype)
        else:
            raise ValueError(model_name)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        self.variables = jax.jit(self.model.init)(jax.random.PRNGKey(seed), x)
        if checkpoint:
            from yolo_puncture_tpu.utils.torch_convert import (
                convert_classifier_state_dict,
                extract_state_dict,
            )

            sd = extract_state_dict(checkpoint)
            self.variables, _ = convert_classifier_state_dict(sd, self.variables)
        self._compiled = {}

    def _forward(self, shape):
        if shape not in self._compiled:

            @jax.jit
            def run(variables, img_u8):
                # BGR→RGB, /255 (numpy2tensor contract, utils/transform.py:15-20)
                x = img_u8[..., ::-1].astype(jnp.float32) / 255.0
                d0, *_ = self.model.apply(variables, x)
                pred = norm_pred(d0[..., 0])
                return (pred > 0.5).astype(jnp.uint8) * 255

            self._compiled[shape] = run
        return self._compiled[shape]

    def predict(self, image_bgr_u8: np.ndarray) -> np.ndarray:
        """Single BGR frame (H, W, 3) → uint8 {0,255} mask (H, W)."""
        x = jnp.asarray(image_bgr_u8[None])
        out = self._forward(x.shape)(self.variables, x)
        return np.asarray(out[0])


def load_unet(model_name: str = "u2netp", model_dir: str = "", device=None, **kw) -> UNetPredictor:
    return UNetPredictor(model_name, checkpoint=model_dir or None, **kw)


def unet_predict(model: UNetPredictor, image: np.ndarray, device=None) -> np.ndarray:
    return model.predict(image)
