"""Smoothing ops must match scipy (the reference's backend) bit-for-bit-ish."""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter1d
from scipy.signal import savgol_filter

from yolo_puncture_tpu.ops.signal import (
    difference,
    gaussian_smoothing,
    gaussian_smoothing_jnp,
    median_smoothing,
    savitzky_golay_smoothing,
)

rng = np.random.default_rng(0)


@pytest.mark.parametrize("sigma", [1, 2, 3])
@pytest.mark.parametrize("n", [10, 57, 300])
def test_gaussian_matches_scipy(sigma, n):
    x = rng.normal(size=n) * 50 + 100
    ours = np.array(gaussian_smoothing(x, sigma=sigma))
    ref = gaussian_filter1d(x, sigma=sigma)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


def test_gaussian_jnp_matches_host():
    import jax.numpy as jnp

    x = rng.normal(size=123) * 50 + 100
    ours = np.array(gaussian_smoothing_jnp(jnp.asarray(x, jnp.float32)))
    ref = gaussian_filter1d(x, sigma=3)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("n", [20, 57, 301])
def test_savgol_matches_scipy(n):
    x = rng.normal(size=n) * 50 + 100
    ours = np.array(savitzky_golay_smoothing(x, 7, 2))
    ref = savgol_filter(x, 7, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-8)


def test_difference_matches_reference_semantics():
    x = rng.normal(size=40)
    d = difference(x)
    fwd = x[1:] - x[:-1]
    ref = np.interp(np.arange(40), np.arange(39), fwd)
    np.testing.assert_allclose(d, ref)


def test_median_smoothing_basic():
    x = np.array([1.0, 100.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0])
    out = median_smoothing(x, 7)
    assert out[1] == 1.0  # outlier suppressed
