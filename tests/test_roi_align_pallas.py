"""Pallas RoIAlign kernel vs the XLA separable implementation
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rgrg_tpu.ops.roi_align import roi_align
from rgrg_tpu.ops.roi_align_pallas import roi_align_pallas

from tests.test_ops import random_boxes

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("n,c", [(64, 256), (100, 512)])
def test_matches_xla(n, c):
    feats = RNG.normal(0, 1, (16, 16, c)).astype(np.float32)
    boxes = random_boxes(n, extent=512.0, min_size=2.0, rng=RNG)
    want = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(boxes)))
    got = np.asarray(roi_align_pallas(jnp.asarray(feats), jnp.asarray(boxes),
                                      interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_edge_boxes():
    feats = RNG.normal(0, 1, (16, 16, 256)).astype(np.float32)
    boxes = np.array([
        [0.0, 0.0, 512.0, 512.0],
        [500.0, 500.0, 512.0, 512.0],
        [0.0, 0.0, 0.5, 0.5],
    ], dtype=np.float32)
    want = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(boxes)))
    got = np.asarray(roi_align_pallas(jnp.asarray(feats), jnp.asarray(boxes),
                                      interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_batched_matches_vmap():
    from rgrg_tpu.ops.roi_align_pallas import roi_align_pallas_batched
    feats = RNG.normal(0, 1, (2, 16, 16, 256)).astype(np.float32)
    boxes = np.stack([random_boxes(40, rng=RNG), random_boxes(40, rng=RNG)])
    got = np.asarray(roi_align_pallas_batched(
        jnp.asarray(feats), jnp.asarray(boxes), interpret=True))
    for b in range(2):
        want = np.asarray(roi_align(jnp.asarray(feats[b]), jnp.asarray(boxes[b])))
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)
