"""Inference proposal budget: exact when survivors fit the budget."""

import dataclasses

import numpy as np
import jax

from rgrg_tpu.core.config import DetectorConfig, RPNConfig, RoIConfig
from rgrg_tpu.models.detector import RegionDetector


def test_budget_exact_when_survivors_fit():
    base = DetectorConfig(rpn=RPNConfig(pre_nms_top_n_test=64,
                                        post_nms_top_n_test=64))
    det_full = RegionDetector(cfg=base)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 512, 1)) * 0.3
    variables = det_full.init(rng, img, train=False)

    # find how many proposals survive; pick a budget above it
    boxes, keep, _ = det_full.apply(
        variables,
        det_full.apply(variables, img, method=det_full.backbone_features),
        method=det_full.rpn_proposals)
    survivors = int(np.asarray(keep).sum())
    budget = min(64, max(8, survivors + 4))

    cfg_b = dataclasses.replace(
        base, roi=RoIConfig(inference_proposal_budget=budget))
    det_b = RegionDetector(cfg=cfg_b)

    full = det_full.apply(variables, img, train=False)
    budgeted = det_b.apply(variables, img, train=False)

    np.testing.assert_array_equal(np.asarray(full["class_detected"]),
                                  np.asarray(budgeted["class_detected"]))
    np.testing.assert_allclose(np.asarray(full["top_scores"]),
                               np.asarray(budgeted["top_scores"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(full["region_features"]),
                               np.asarray(budgeted["region_features"]),
                               rtol=1e-4, atol=1e-5)
