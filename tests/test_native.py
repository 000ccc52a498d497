"""Native C++ preprocessing library vs cv2/numpy reference."""

import numpy as np
import cv2
import pytest

from rgrg_tpu.data import native
from rgrg_tpu.data.transforms import TransformConfig, val_transform

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="librgrg_host.so not built")

RNG = np.random.default_rng(0)


def test_resize_area_matches_cv2():
    img = RNG.integers(0, 256, (900, 700), dtype=np.uint8)
    want = cv2.resize(img, (398, 512), interpolation=cv2.INTER_AREA)
    got = np.round(native.resize_area(img, 512, 398))
    # cv2 uses fixed-point arithmetic; ties may round differently on a tiny
    # fraction of pixels
    match = (got == want.astype(np.float32)).mean()
    assert match > 0.9999
    assert np.abs(got - want).max() <= 1.0


def test_pipeline_matches_python_path():
    for shape in [(900, 700), (512, 512), (3056, 2544)]:
        img = RNG.integers(0, 256, shape, dtype=np.uint8)
        got = native.preprocess_batch([img])[0]
        want, _ = val_transform(img)
        assert got.shape == want.shape == (512, 512, 1)
        # differences only from uint8 rounding ties: <= 1 lsb normalized
        assert np.abs(got - want).max() <= 1.01 / (0.302 * 255)


def test_batch_consistency():
    imgs = [RNG.integers(0, 256, (600 + 13 * i, 500), dtype=np.uint8)
            for i in range(5)]
    batch = native.preprocess_batch(imgs, threads=3)
    assert batch.shape == (5, 512, 512, 1)
    for i, img in enumerate(imgs):
        single = native.preprocess_batch([img])[0]
        np.testing.assert_array_equal(batch[i], single)


def test_padding_value_is_normalized_zero():
    img = np.full((512, 256), 128, np.uint8)  # tall -> horizontal pad
    out = native.preprocess_batch([img])[0][..., 0]
    pad_val = (0.0 - 0.471 * 255) / (0.302 * 255)
    np.testing.assert_allclose(out[:, 0], pad_val, rtol=1e-5)
    np.testing.assert_allclose(out[:, -1], pad_val, rtol=1e-5)
