"""ctypes bindings for the native host-preprocessing library.

`preprocess_batch(images)` runs the full resize+pad+normalize pipeline for
a batch of grayscale arrays in C++ worker threads (native/preprocess.cc),
writing one NHWC float32 output buffer. Falls back to the numpy/cv2 path
(rgrg_tpu.data.transforms) when the shared object hasn't been built
(`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

from rgrg_tpu.core import constants as C

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "librgrg_host.so"),
    os.path.join(os.path.dirname(__file__), "librgrg_host.so"),
]

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        if os.path.exists(path):
            lib = ctypes.CDLL(os.path.abspath(path))
            lib.rgrg_preprocess_batch.argtypes = [
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int]
            lib.rgrg_resize_area.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
            _lib = lib
            return lib
    return None


def native_available() -> bool:
    return _load() is not None


def preprocess_batch(images: Sequence[np.ndarray], size: int = C.IMAGE_SIZE,
                     mean: float = C.IMAGE_MEAN, std: float = C.IMAGE_STD,
                     max_pixel: float = 255.0, threads: int = 0) -> np.ndarray:
    """images: list of [H, W] uint8 arrays -> [N, size, size, 1] float32.

    Uses the C++ library when built, otherwise the numpy/cv2 transforms.
    """
    lib = _load()
    if lib is None:
        from rgrg_tpu.data.transforms import TransformConfig, val_transform
        cfg = TransformConfig(image_size=size, mean=mean, std=std,
                              max_pixel_value=max_pixel)
        return np.stack([val_transform(im, None, cfg)[0] for im in images])

    n = len(images)
    contig: List[np.ndarray] = [np.ascontiguousarray(im, np.uint8)
                                for im in images]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in contig])
    heights = (ctypes.c_int * n)(*[im.shape[0] for im in contig])
    widths = (ctypes.c_int * n)(*[im.shape[1] for im in contig])
    out = np.empty((n, size, size), np.float32)
    lib.rgrg_preprocess_batch(
        ptrs, heights, widths, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size,
        ctypes.c_float(mean), ctypes.c_float(std), ctypes.c_float(max_pixel),
        threads)
    return out[..., None]


def resize_area(image: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Native INTER_AREA-equivalent resize (uint8 [H, W] -> float32 [dh, dw])."""
    lib = _load()
    assert lib is not None, "native library not built (make -C native)"
    image = np.ascontiguousarray(image, np.uint8)
    out = np.empty((dh, dw), np.float32)
    lib.rgrg_resize_area(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        image.shape[0], image.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw)
    return out
