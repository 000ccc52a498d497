"""Pallas NMS kernel vs the lax implementations (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rgrg_tpu.ops import nms as nms_lib
from rgrg_tpu.ops.nms_pallas import nms_keep_mask_pallas

from tests.test_ops import random_boxes


@pytest.mark.parametrize("n,seed,thresh", [(128, 0, 0.7), (300, 1, 0.5),
                                           (1000, 2, 0.7)])
def test_pallas_matches_lax(n, seed, thresh):
    rng = np.random.default_rng(seed)
    base = random_boxes(max(n // 10, 4), rng=rng)
    jitter = rng.normal(0, 8, (n, 4)).astype(np.float32)
    boxes = np.clip(base[rng.integers(0, len(base), n)] + jitter, 0, 512)
    boxes[:, 2] = np.maximum(boxes[:, 2], boxes[:, 0] + 1)
    boxes[:, 3] = np.maximum(boxes[:, 3], boxes[:, 1] + 1)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    sb = jnp.asarray(boxes[order])
    valid = jnp.ones((n,), bool)

    want = np.asarray(nms_lib.nms_keep_mask(sb, valid, thresh))
    got = np.asarray(nms_keep_mask_pallas(sb, valid, thresh, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_validity_mask():
    boxes = np.zeros((130, 4), np.float32)
    boxes[:, 2:] = 10.0
    boxes[1] = [0, 0, 10.1, 10]
    boxes[2] = [100, 100, 110, 110]
    valid = np.zeros(130, bool)
    valid[[0, 1, 2]] = [False, True, True]
    got = np.asarray(nms_keep_mask_pallas(jnp.asarray(boxes),
                                          jnp.asarray(valid), 0.5,
                                          interpret=True))
    assert got[1] and got[2] and not got[0]
    assert not got[3:].any()
