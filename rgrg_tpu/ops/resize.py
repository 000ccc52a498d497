"""On-device image preprocessing: resize + pad + normalize as two matmuls.

The host C++ pipeline (native/preprocess.cc) resizes each X-ray with
separable area averaging (downscale) or cv2's INTER_AREA area-mode
two-tap interpolation (the rare upscale case),
rounds to the uint8 domain, center-pads to 512x512 and normalizes — all on
a 1-core serving host, which makes the HOST the product-path bottleneck
(~6 ms/image while the TPU sits at 0.3 s for a 32-image fused step).

Both resize modes are LINEAR in the source pixels and separable, so the
whole pipeline maps onto the MXU: precompute per-axis weight matrices
`wy [512, H]` / `wx [W, 512]` on the host (one small numpy build per
distinct input shape, cached), embed the centering pad as zero rows/cols
(a padded cell accumulates q = 0, and (0 - mean*max)/std*max is exactly the
C++ pad value), then on device

    q   = round(wy @ img_u8 @ wx)          # two dot_generals, f32 HIGHEST
    out = (q - mean*max_pixel) / (std*max_pixel)

`round` is round-half-even on both sides (C nearbyintf and jnp.round), and
the weights are identical floats, so the only divergence from the C++ path
is f32 summation order inside the dots — observable solely when an exact
.5 rounding boundary sits within ~1e-5 of the accumulated sum (quantified
in tests/test_resize_device.py). The host's per-batch work collapses to a
uint8 np.stack, and the upload shrinks to the raw bytes.

Reference parity: the semantics being replicated are the reference's
albumentations val pipeline — LongestMaxSize(INTER_AREA) -> PadIfNeeded
(border 0) -> Normalize(mean, std) (object_detector/training_script
val transforms; see data/transforms.py) — via the same uint8 intermediate.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgrg_tpu.core import constants as C


def _area_axis_weights(src: int, dst: int) -> np.ndarray:
    """[dst, src] fractional-coverage area-average weights (rows sum to 1).

    Same tap math as native/preprocess.cc area_axis_weights: per output
    cell, coverage of each source cell under the forward map, normalized
    in float32 exactly like the C++ table (cov and total accumulate in
    double, the stored tap is float(cov/total))."""
    scale = src / dst
    w = np.zeros((dst, src), np.float32)
    for o in range(dst):
        a0, a1 = o * scale, (o + 1) * scale
        i0 = int(a0)
        i1 = min(int(np.ceil(a1)), src)
        covs = [min(i + 1, a1) - max(i, a0) for i in range(i0, i1)]
        total = sum(covs)
        for i, cov in zip(range(i0, i1), covs):
            # C++ stores float(cov) then divides by the double total:
            # replicate the double-rounding for bit-identical taps
            w[o, i] = np.float32(float(np.float32(cov)) / total)
    return w


def _area_upscale_axis_weights(src: int, dst: int) -> np.ndarray:
    """[dst, src] cv2 INTER_AREA upscale weights (<=2 taps per row).

    For scale < 1 OpenCV's resize keeps INTER_AREA but computes two-tap
    coefficients as s0 = floor(o*scale), f = (o+1) - (s0+1)*dst/src,
    f = f <= 0 ? 0 : f - floor(f) (resize.cpp's area branch) — NOT
    half-pixel-center bilinear, which diverges from cv2 by up to dozens
    of gray levels. Mirrors native/preprocess.cc resize_area_upscale
    bit-identically (double coordinate math, float32 taps); cv2's uint8
    path runs the same taps in 11-bit fixed point, a <=1-gray-level
    truncation difference documented in tests/test_resize_device.py."""
    inv = dst / src
    # cv2 derives scale as 1/inv_scale (resize.cpp), NOT src/dst: the 1-ulp
    # difference moves floor(o*scale) where o*scale is an exact integer
    scale = 1.0 / inv
    w = np.zeros((dst, src), np.float32)
    for o in range(dst):
        i0 = int(np.floor(o * scale))
        f = (o + 1) - (i0 + 1) * inv
        f = 0.0 if f <= 0 else f - np.floor(f)
        i1 = min(i0 + 1, src - 1)
        l = np.float32(f)
        w[o, i0] += np.float32(1.0) - l
        w[o, i1] += l
    return w


def _axis_matrix(src: int, dst: int, scale: float) -> np.ndarray:
    if dst == src:
        return np.eye(dst, dtype=np.float32)
    if scale < 1.0:
        return _area_axis_weights(src, dst)
    return _area_upscale_axis_weights(src, dst)


@functools.lru_cache(maxsize=256)
def resize_matrices(sh: int, sw: int, size: int = C.IMAGE_SIZE
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """(wy [size, sh], wx [sw, size]) for one source shape.

    Longest-max-size target dims and the centering offsets follow
    native/preprocess.cc preprocess_one exactly (half-even dim rounding,
    top/left = (size - d)/2); rows/cols outside the resized window are
    zero, which after the affine normalization yields the pad value."""
    scale = size / max(sh, sw)
    # half-EVEN tie rounding: albumentations' LongestMaxSize rounds dims
    # with Python round (data/transforms.py longest_max_size) — a tie shape
    # like 961x1024 (961*0.5 = 480.5 -> 480, not 481) otherwise shifts the
    # whole resized window one row vs the reference pipeline
    dh = max(1, round(sh * scale))
    dw = max(1, round(sw * scale))
    top = max((size - dh) // 2, 0)
    left = max((size - dw) // 2, 0)
    wy = np.zeros((size, sh), np.float32)
    wy[top:top + dh] = _axis_matrix(sh, dh, scale)
    wx = np.zeros((sw, size), np.float32)
    wx[:, left:left + dw] = _axis_matrix(sw, dw, scale).T
    return wy, wx


def device_preprocess(images_u8: jnp.ndarray, wy: jnp.ndarray,
                      wx: jnp.ndarray, mean: float = C.IMAGE_MEAN,
                      std: float = C.IMAGE_STD, max_pixel: float = 255.0,
                      out_dtype=jnp.float32) -> jnp.ndarray:
    """[B, H, W] uint8 -> [B, size, size, 1] normalized, on device.

    Designed to inline into the detect/detect_and_decode graphs: the resize
    dots are ~25 GFLOP at B=64 (sub-ms on the MXU) vs ~0.4 s of host C++
    they replace. HIGHEST precision keeps the f32 accumulation faithful to
    the host pipeline — default TPU f32 matmuls run as bf16 passes, whose
    ~1e-3 error would flip uint8 roundings wholesale."""
    x = images_u8.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    # [size, H] @ [B, H, W] -> [B, size, W]
    r = jnp.einsum("oh,bhw->bow", wy, x, precision=hi)
    # [B, size, W] @ [W, size] -> [B, size, size]
    r = jnp.einsum("bow,wx->box", r, wx, precision=hi)
    q = jnp.round(r)  # uint8-domain quantization (round-half-even)
    denom = np.float32(std * max_pixel)
    bias = np.float32(mean * max_pixel)
    out = (q - bias) / denom
    return out[..., None].astype(out_dtype)
