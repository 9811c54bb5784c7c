"""INT8 conv serving path — zero model-code changes.

``with int8_convs(): model.apply(...)`` swaps every bias-free, non-grouped
``nn.Conv`` (i.e. each ConvBN's convolution — the MXU FLOPs of the YOLO
backbone/neck/heads) for an s8×s8→s32 convolution via a flax method
interceptor:

  * activations quantize DYNAMICALLY per tensor (absmax/127, computed
    in-graph — no calibration pass or stored scales needed; a reduction is
    trivial next to the conv itself);
  * weights quantize per OUTPUT CHANNEL from the fp32 params each call (the
    quantization is deterministic, so XLA CSEs it across reuses; cost is
    O(params) per batch, negligible at serving batch sizes);
  * the s32 result dequantizes with ``sx · sk[oc]`` and flows into the
    unchanged fp BatchNorm + SiLU epilogue.

Excluded on purpose: biased convs (the detection-head prediction layers —
kept fp for box/cls fidelity), grouped/depthwise convs (no MXU win),
ConvTranspose, Dense.  TPU v5e executes s8 matmuls at 2× bf16 peak; use for
serving, not training.  Detection-quality impact must be validated on real
fine-tuned weights (tests pin numeric fidelity on random weights only).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from flax import linen as nn


def _module_key(mod) -> str:
    return "/".join(str(p) for p in mod.path)


def _int8_conv(mod: nn.Conv, x, act_scale=None):
    kernel = mod.variables["params"]["kernel"]
    xf = x.astype(jnp.float32)
    if act_scale is not None:
        # static calibrated scale: no per-batch reduction in the graph
        sx = jnp.float32(max(float(act_scale), 1e-8) / 127.0)
    else:
        sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
    xi8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    kf = jnp.asarray(kernel).astype(jnp.float32)
    sk = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-12) / 127.0
    ki8 = jnp.clip(jnp.round(kf / sk), -127, 127).astype(jnp.int8)
    strides = mod.strides if isinstance(mod.strides, (tuple, list)) else (mod.strides,) * 2
    dil = mod.kernel_dilation
    dil = dil if isinstance(dil, (tuple, list)) else (dil or 1,) * 2
    y = jax.lax.conv_general_dilated(
        xi8,
        ki8,
        window_strides=tuple(strides),
        padding=mod.padding,
        rhs_dilation=tuple(dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    out_dtype = mod.dtype or x.dtype
    return (y * (sx * sk)).astype(out_dtype)


def _eligible(mod) -> bool:
    return (
        isinstance(mod, nn.Conv)
        and not mod.use_bias
        and mod.feature_group_count == 1
        and not mod.is_initializing()
        and isinstance(mod.padding, (list, tuple))  # explicit numeric padding
    )


@contextlib.contextmanager
def int8_convs(enabled: bool = True, act_scales=None):
    """Context manager: inside, ``model.apply`` runs eligible convs in int8.

    Must be active at TRACE time (wrap the apply call inside your jitted
    function); the traced graph then embeds the int8 ops permanently.

    ``act_scales`` (from :func:`collect_act_scales`) switches activation
    quantization from dynamic per-batch absmax to STATIC calibrated scales
    keyed by module path — the standard PTQ serving configuration: the
    per-conv abs-max reduction disappears from the graph and scales stop
    depending on batch composition.  Convs missing from the dict fall back
    to dynamic scaling.
    """
    if not enabled:
        yield
        return

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if context.method_name == "__call__" and _eligible(mod):
            s = act_scales.get(_module_key(mod)) if act_scales else None
            return _int8_conv(mod, args[0], act_scale=s)
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield


def collect_act_scales(apply_fn, batches, percentile: float = 99.9) -> dict:
    """Calibration pass: per-conv activation scale for static-int8 serving.

    Runs ``apply_fn(batch)`` eagerly for each calibration batch under a
    recording interceptor and returns ``{module_path: amax}`` where ``amax``
    is the max over batches of the per-batch ``percentile`` of ``|x|``
    (``percentile=100`` → plain absmax).  Pass the result to
    ``int8_convs(act_scales=...)``.  Forward outputs are unchanged (the
    recorder observes inputs, convs still run fp during calibration).
    """
    scales: dict = {}

    def recorder(next_fn, args, kwargs, context):
        mod = context.module
        if context.method_name == "__call__" and _eligible(mod):
            a = jnp.abs(args[0].astype(jnp.float32))
            amax = (
                jnp.max(a) if percentile >= 100.0
                else jnp.percentile(a.ravel(), percentile)
            )
            k = _module_key(mod)
            scales[k] = max(scales.get(k, 0.0), float(amax))
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(recorder):
        for batch in batches:
            apply_fn(batch)
    return scales
