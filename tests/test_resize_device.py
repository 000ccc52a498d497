"""Device-preprocess (ops/resize.py) vs the host pipeline oracle.

The device path reproduces native/preprocess.cc (resize -> uint8-domain
round -> center pad -> normalize) as two HIGHEST-precision dot_generals.
The only admissible divergence is f32 summation order inside the dots,
visible solely when a pre-round value sits within ~1e-5 of an exact .5
boundary — so outputs must match the host pipeline everywhere except a
vanishing fraction of pixels, and any differing pixel by exactly one
uint8 quantization step.
"""

import numpy as np
import pytest

from rgrg_tpu.core import constants as C
from rgrg_tpu.data.native import native_available, preprocess_batch
from rgrg_tpu.ops.resize import device_preprocess, resize_matrices

QUANT = 1.0 / (C.IMAGE_STD * 255.0)  # one uint8 step after normalization

SHAPES = [
    (700, 600),    # downscale, both axes (bench serving shape)
    (300, 200),    # upscale (bilinear path)
    (512, 512),    # identity
    (1024, 256),   # extreme aspect: wide pad
    (513, 511),    # off-by-one around the target size
]


@pytest.mark.parametrize("shape", SHAPES, ids=[f"{h}x{w}" for h, w in SHAPES])
def test_device_matches_host_pipeline(shape):
    rng = np.random.default_rng(hash(shape) % 2**32)
    imgs = rng.integers(0, 256, (3, *shape), dtype=np.uint8)

    host = preprocess_batch(list(imgs))                     # [B,512,512,1] f32
    wy, wx = resize_matrices(*shape)
    dev = np.asarray(device_preprocess(imgs, wy, wx))

    diff = np.abs(dev - host)
    _assert_matches_host(diff, shape)


def _assert_matches_host(diff, shape):
    """Against the native host path the device dots share exact tap floats,
    so only f32 summation-order ties diverge (one quant step, vanishing
    fraction). Against the cv2 FALLBACK the fractional-downscale/identity
    regimes are equally tight, but cv2's uint8 kernels use fixed-point
    arithmetic with different rounding conventions — 11-bit taps with
    inter-pass floors on upscale (resize.cpp VResizeLinear u8), (sum+2)>>2
    half-UP averaging on integer fast-area downscale — while our dots
    evaluate the same taps in float with half-even quantization: up to one
    quant step on ~3-10% of pixels (worst unrounded gap measured 0.79
    gray on upscale; exact-tie flips only on fast-area)."""
    assert diff.max() <= QUANT * 1.001, (shape, diff.max())
    mismatch = (diff > QUANT * 1e-3).mean()
    if native_available():
        assert mismatch < 1e-3, f"{mismatch:.2e} of pixels off by a step"
    else:
        assert mismatch < 0.12, f"{mismatch:.2e} of pixels off by a step"


def test_device_matches_host_fuzz_shapes():
    """Random source shapes across the downscale/upscale/identity regimes
    (CXR plates range from few-hundred-px crops to 3000+-px panels)."""
    rng = np.random.default_rng(7)
    for _ in range(12):
        h = int(rng.integers(96, 1600))
        w = int(rng.integers(96, 1600))
        img = rng.integers(0, 256, (1, h, w), dtype=np.uint8)
        host = preprocess_batch(list(img))
        wy, wx = resize_matrices(h, w)
        dev = np.asarray(device_preprocess(img, wy, wx))
        diff = np.abs(dev - host)
        _assert_matches_host(diff, (h, w))


def test_weight_rows_sum_to_one_inside_window():
    wy, wx = resize_matrices(700, 600)
    # resized window rows/cols sum to 1; pad rows/cols are exactly zero
    row_sums = wy.sum(axis=1)
    inside = row_sums > 0.5
    np.testing.assert_allclose(row_sums[inside], 1.0, atol=1e-6)
    assert np.all(wy[~inside] == 0.0)
    col_sums = wx.sum(axis=0)
    inside = col_sums > 0.5
    np.testing.assert_allclose(col_sums[inside], 1.0, atol=1e-6)


def test_upscale_weights_match_cv2_inter_area():
    """The upscale weight rows implement cv2's INTER_AREA area-mode taps
    (resize.cpp: s0 = floor(o*scale), f = (o+1) - (s0+1)*dst/src, two taps)
    — pinned directly against cv2.resize, independent of the native lib.
    cv2's uint8 kernel quantizes the same taps to 11-bit fixed point with
    inter-pass floors, bounding the float-vs-cv2 gap below one gray level."""
    import cv2

    from rgrg_tpu.ops.resize import _area_upscale_axis_weights

    rng = np.random.default_rng(3)
    for (sh, sw), (dh, dw) in [((302, 275), (512, 466)),
                               ((300, 200), (512, 341)),
                               ((97, 113), (440, 512))]:
        img = rng.integers(0, 256, (sh, sw), dtype=np.uint8)
        want = cv2.resize(img, (dw, dh),
                          interpolation=cv2.INTER_AREA).astype(np.float32)
        wy = _area_upscale_axis_weights(sh, dh)
        wx = _area_upscale_axis_weights(sw, dw)
        ours = wy @ img.astype(np.float32) @ wx.T
        assert np.abs(ours - want).max() < 1.0, (sh, sw)


@pytest.mark.skipif(not native_available(),
                    reason="native library not built (make -C native)")
def test_area_weights_match_native_unrounded():
    """Wy @ img @ Wx (pre-round) vs the C++ separable area resize."""
    from rgrg_tpu.data.native import resize_area
    from rgrg_tpu.ops.resize import _area_axis_weights

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (700, 600), dtype=np.uint8)
    dh, dw = 512, 439  # the (700, 600) longest-max-size target
    native = resize_area(img, dh, dw)
    wy = _area_axis_weights(700, dh)
    wx = _area_axis_weights(600, dw)
    ours = wy @ img.astype(np.float32) @ wx.T
    np.testing.assert_allclose(ours, native, atol=2e-3)
