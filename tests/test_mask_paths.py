"""Retina vs non-retina mask un-letterboxing must land at the same original-frame
location (regression for proto-res masks being pasted with letterbox-res pads)."""

import jax.numpy as jnp
import numpy as np

from yolo_puncture_tpu.ops.letterbox import letterbox_params
from yolo_puncture_tpu.ops.masks import paste_masks_to_original


def test_proto_and_letterbox_res_paste_align():
    h0, w0, S = 96, 128, 64
    r, (nw, nh), (left, top) = letterbox_params(h0, w0, S)

    # a square blob at a known ORIGINAL location → letterboxed coords
    oy1, oy2, ox1, ox2 = 30, 60, 40, 90
    ly1, ly2 = int(oy1 * r) + top, int(oy2 * r) + top
    lx1, lx2 = int(ox1 * r) + left, int(ox2 * r) + left

    mask_lb = np.zeros((1, 1, S, S), np.float32)
    mask_lb[0, 0, ly1:ly2, lx1:lx2] = 1.0
    mask_p4 = np.zeros((1, 1, S // 4, S // 4), np.float32)
    mask_p4[0, 0, ly1 // 4 : max(ly2 // 4, ly1 // 4 + 1), lx1 // 4 : max(lx2 // 4, lx1 // 4 + 1)] = 1.0

    out_retina = np.asarray(
        paste_masks_to_original(jnp.asarray(mask_lb), r, (left, top), (h0, w0))
    )[0, 0]
    out_proto = np.asarray(
        paste_masks_to_original(jnp.asarray(mask_p4), r / 4, (left / 4, top / 4), (h0, w0))
    )[0, 0]

    a = out_retina > 0.5
    b = out_proto > 0.5
    assert a.sum() > 0 and b.sum() > 0
    ca = np.argwhere(a).mean(0)
    cb = np.argwhere(b).mean(0)
    # proto res is 4× coarser → allow one proto pixel (≈ 4/r orig px) of centroid slack
    tol = 4 / r + 2
    assert np.abs(ca - cb).max() < tol, f"paths displaced: {ca} vs {cb}"
    # and the retina path lands on the intended original region
    expected_center = np.array([(oy1 + oy2) / 2, (ox1 + ox2) / 2])
    assert np.abs(ca - expected_center).max() < 6


def test_fractional_pad_carried_exactly():
    """pad % 4 != 0: the proto-res paste must NOT shift masks by the rounded
    pad (ADVICE r2 predictor.py:193).  Compare against a dense float reference
    sampled at the exact fractional offsets."""
    h0, w0, S = 100, 128, 64  # r = 0.5, pad top = (64-50)/2 = 7 → 7/4 fractional
    r, (nw, nh), (left, top) = letterbox_params(h0, w0, S)
    assert top % 4 != 0, "geometry must exercise a fractional proto pad"

    rng = np.random.default_rng(3)
    mask_p4 = rng.uniform(0, 1, size=(1, 1, S // 4, S // 4)).astype(np.float32)

    out = np.asarray(
        paste_masks_to_original(
            jnp.asarray(mask_p4), r / 4, (left / 4, top / 4), (h0, w0)
        )
    )[0, 0]

    # dense numpy reference: output center (i+0.5) samples proto coord
    # (i+0.5)*(r/4) + pad/4 (bilinear, zero outside)
    m = mask_p4[0, 0]
    H4, W4 = m.shape

    def sample(yc, xc):
        # bilinear with edge-kernel renormalization (scale_and_translate
        # drops out-of-range taps and renormalizes the remaining weights)
        py, px = yc - 0.5, xc - 0.5
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        wy, wx = py - y0, px - x0
        tot, wsum = 0.0, 0.0
        for dy, fy in ((0, 1 - wy), (1, wy)):
            for dx, fx in ((0, 1 - wx), (1, wx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < H4 and 0 <= xx < W4:
                    tot += fy * fx * m[yy, xx]
                    wsum += fy * fx
        return tot / wsum if wsum > 0 else 0.0

    ref = np.zeros((h0, w0), np.float32)
    for i in range(h0):
        for j in range(w0):
            ref[i, j] = sample((i + 0.5) * r / 4 + top / 4, (j + 0.5) * r / 4 + left / 4)
    np.testing.assert_allclose(out, ref, atol=2e-5)
