"""1-D signal smoothing for the needle-length series.

Reference contracts (yolo_seg/utils/speed_tools.py:15-34):
  * ``gaussian_smoothing(lens, sigma=3)`` — scipy.ndimage.gaussian_filter1d defaults
    (mode='reflect', truncate=4.0).
  * ``savitzky_golay_smoothing(lens, 7, 2)`` — scipy.signal.savgol_filter defaults
    (mode='interp': polynomial edge fit).
  * ``difference`` — forward difference, re-interped to input length.

Implementations are scipy-free (device-friendly jnp convolutions per SURVEY.md §7.4)
but bit-matched to scipy in tests/test_signal.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _gaussian_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * x * x / (float(sigma) ** 2))
    return phi / phi.sum()


def gaussian_smoothing(lens, sigma: float = 3.0, truncate: float = 4.0):
    """Gaussian smoothing with scipy gaussian_filter1d('reflect') semantics.

    Accepts list/ndarray; returns a Python list like the reference
    (speed_tools.py:15-17 returns ``.tolist()``).
    """
    x = np.asarray(lens, dtype=np.float64)
    if x.size == 0:
        return []
    w = _gaussian_kernel(sigma, truncate)
    radius = (len(w) - 1) // 2
    xp = np.pad(x, radius, mode="symmetric")  # scipy 'reflect' == numpy 'symmetric'
    out = np.convolve(xp, w[::-1], mode="valid")
    return out.tolist()


def gaussian_smoothing_jnp(x: jnp.ndarray, sigma: float = 3.0, truncate: float = 4.0):
    """Device-side variant (used inside the fused analytics program)."""
    import jax

    w = jnp.asarray(_gaussian_kernel(sigma, truncate), dtype=x.dtype)
    radius = (w.shape[0] - 1) // 2
    xp = jnp.pad(x, radius, mode="symmetric")
    # HIGHEST: keep fp32 accumulation on TPU (default would downcast to bf16)
    return jnp.convolve(xp, w[::-1], mode="valid", precision=jax.lax.Precision.HIGHEST)


def _savgol_coeffs(window: int, order: int) -> np.ndarray:
    half = window // 2
    pos = np.arange(-half, half + 1, dtype=np.float64)
    A = pos[:, None] ** np.arange(order + 1)[None, :]
    # least-squares fit evaluated at center: first row of pinv
    return np.linalg.pinv(A)[0]


def savitzky_golay_smoothing(lens, window_size: int = 7, poly_order: int = 2):
    """Savitzky-Golay with scipy savgol_filter mode='interp' edge handling."""
    x = np.asarray(lens, dtype=np.float64)
    n = x.size
    if n == 0:
        return []
    if n < window_size:
        # scipy raises here; reference never hits this (videos ≫ 7 frames)
        raise ValueError("window_size is too large for the input")
    c = _savgol_coeffs(window_size, poly_order)
    half = window_size // 2
    interior = np.convolve(x, c[::-1], mode="valid")  # length n - window + 1
    out = np.empty(n, dtype=np.float64)
    out[half : n - half] = interior
    # 'interp': polynomial fit on the first/last window evaluated at edge points
    p_head = np.polynomial.polynomial.polyfit(np.arange(window_size), x[:window_size], poly_order)
    out[:half] = np.polynomial.polynomial.polyval(np.arange(half), p_head)
    p_tail = np.polynomial.polynomial.polyfit(
        np.arange(window_size), x[n - window_size :], poly_order
    )
    out[n - half :] = np.polynomial.polynomial.polyval(
        np.arange(window_size - half, window_size), p_tail
    )
    return out.tolist()


def difference(lens):
    """Forward difference re-interpolated to input length (speed_tools.py:25-34)."""
    x = np.asarray(lens, dtype=np.float64)
    if x.size < 2:
        return np.zeros_like(x)
    diff = x[1:] - x[:-1]
    return np.interp(np.arange(x.size), np.arange(diff.size), diff)


def median_smoothing(lens, k: int = 7):
    """Median filter (info.md:89 ablation row)."""
    x = np.asarray(lens, dtype=np.float64)
    if x.size == 0:
        return []
    half = k // 2
    xp = np.pad(x, half, mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(xp, k)
    return np.median(windows, axis=1).tolist()
