"""Fused RoIAlign+avgpool+fc6 kernel vs the XLA composition (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp

from rgrg_tpu.ops.roi_align import roi_align_batched
from rgrg_tpu.ops.roi_fc6_pallas import roi_align_fc6

from tests.test_ops import random_boxes

RNG = np.random.default_rng(9)


def test_matches_xla_composition():
    b, c, n, rep = 2, 256, 40, 128
    feats = RNG.normal(0, 1, (b, 16, 16, c)).astype(np.float32)
    boxes = np.stack([random_boxes(n, rng=RNG) for _ in range(b)])
    w6 = RNG.normal(0, 0.02, (8 * 8 * c, rep)).astype(np.float32)

    fc6, bf = roi_align_fc6(jnp.asarray(feats), jnp.asarray(boxes),
                            jnp.asarray(w6), interpret=True)

    pooled = roi_align_batched(jnp.asarray(feats), jnp.asarray(boxes))
    want_bf = np.asarray(pooled.mean(axis=(2, 3)))
    flat = np.asarray(pooled).reshape(b, n, -1)
    want_fc6 = np.einsum("bnf,fr->bnr", flat.astype(np.float32),
                         w6.astype(np.float32))

    np.testing.assert_allclose(np.asarray(bf), want_bf, rtol=1e-4, atol=1e-4)
    # fc6 partials run in bf16 on the MXU: compare with bf16-ish tolerance
    np.testing.assert_allclose(np.asarray(fc6), want_fc6, rtol=2e-2, atol=2e-2)


def test_padding_rois():
    b, c, n, rep = 1, 128, 7, 64  # n not a multiple of ROI_BLOCK
    feats = RNG.normal(0, 1, (b, 16, 16, c)).astype(np.float32)
    boxes = random_boxes(n, rng=RNG)[None]
    w6 = RNG.normal(0, 0.02, (8 * 8 * c, rep)).astype(np.float32)
    fc6, bf = roi_align_fc6(jnp.asarray(feats), jnp.asarray(boxes),
                            jnp.asarray(w6), interpret=True)
    assert fc6.shape == (1, 7, 64) and bf.shape == (1, 7, 128)


def test_detector_fused_flag_matches(monkeypatch):
    """detect() with use_fused_roi_fc6 must match the unfused path
    (bf16-tolerance) on a small proposal budget."""
    import dataclasses
    import jax
    from rgrg_tpu.core.config import DetectorConfig, RPNConfig
    from rgrg_tpu.models.detector import RegionDetector
    import rgrg_tpu.ops.roi_fc6_pallas as fused_mod

    # interpret mode on CPU
    orig = fused_mod.roi_align_fc6

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(fused_mod, "roi_align_fc6", interp)

    base = DetectorConfig(rpn=RPNConfig(pre_nms_top_n_test=64,
                                        post_nms_top_n_test=64))
    det = RegionDetector(cfg=base)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 512, 1)) * 0.3
    variables = det.init(jax.random.PRNGKey(0), img, train=False)
    want = det.apply(variables, img, train=False)

    det_f = RegionDetector(cfg=dataclasses.replace(base, use_fused_roi_fc6=True))
    got = det_f.apply(variables, img, train=False)

    np.testing.assert_array_equal(np.asarray(want["class_detected"]),
                                  np.asarray(got["class_detected"]))
    np.testing.assert_allclose(np.asarray(got["top_scores"]),
                               np.asarray(want["top_scores"]),
                               rtol=5e-2, atol=1e-3)
    # bf16 fc6 perturbs near-tied argmax winners for a few regions (random
    # weights make many proposals near-identical); the overwhelming majority
    # of feature elements must still match
    diff = np.abs(np.asarray(got["region_features"])
                  - np.asarray(want["region_features"]))
    assert float(np.quantile(diff, 0.97)) < 5e-2
