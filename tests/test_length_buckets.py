"""Greedy length-bucket cascade must equal a single full-length decode."""

import dataclasses

import numpy as np
import jax
import pytest

from rgrg_tpu.core.config import GenerationConfig
from rgrg_tpu.models.full_model import RGRG

from tests.test_full_model import SMOKE_CFG


def test_cascade_equals_full_decode():
    cfg = dataclasses.replace(
        SMOKE_CFG, generation=GenerationConfig(length_buckets=(4, 12)))
    model = RGRG(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 512, 1)) * 0.3

    out = model.generate(params, images, max_length=12, num_beams=1)

    det = model.detect(params, images)
    sel = det["selected_regions"]
    ids_full, dec_full = model.decode_selected(
        params, det["region_features"], sel,
        model.budget_for(int(np.asarray(sel).sum()), 2), 12)

    np.testing.assert_array_equal(out["decoded_mask"], np.asarray(dec_full))
    np.testing.assert_array_equal(out["output_ids"], np.asarray(ids_full))
