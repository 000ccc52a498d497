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


def test_cascade_max_length_beyond_last_bucket():
    """max_length past the last config bucket must append a final rung, not
    silently return prefixes truncated at buckets[-1] (rows unfinished at
    the last bucket would otherwise be padded with pad_id and reported as
    decoded)."""
    cfg = dataclasses.replace(
        SMOKE_CFG, generation=GenerationConfig(length_buckets=(4, 8)))
    model = RGRG(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 512, 1)) * 0.3
    max_length = 14  # > buckets[-1] == 8

    det = model.detect(params, images)
    sel = det["selected_regions"]
    ids_c, dec_c = model.decode_selected_cascade(
        params, det["region_features"], sel, max_length)
    ids_full, dec_full = model.decode_selected(
        params, det["region_features"], sel,
        model.budget_for(int(np.asarray(sel).sum()), 2), max_length)

    np.testing.assert_array_equal(np.asarray(dec_c), np.asarray(dec_full))
    np.testing.assert_array_equal(np.asarray(ids_c), np.asarray(ids_full))


def test_budget_for_mesh_rounds_up():
    model = RGRG(cfg=SMOKE_CFG)

    class FakeMesh:
        size = 4

    assert model.budget_for(9, 4) == 12
    assert model.budget_for(9, 4, mesh=FakeMesh()) == 12
    assert model.budget_for(5, 4, mesh=FakeMesh()) == 8
    # ladder value 24 already divisible; 29*B cap divisible when B % m == 0
    assert model.budget_for(17, 4, mesh=FakeMesh()) == 24
    # a hypothetical non-divisible ladder pick rounds UP to mesh.size
    class Mesh3:
        size = 3

    assert model.budget_for(7, 4, mesh=Mesh3()) % 3 == 0


@pytest.mark.parametrize("early_stopping", [True, False])
def test_beam_cascade_equals_full_decode(early_stopping):
    """Beam cascade == single full-length beam decode, both early_stopping
    modes. A row is bucket-final only when its search CLOSED (done) and
    its hypothesis + EOS fit the bucket; open rows re-decode at the next
    rung (their alive beams could still beat the finished pool)."""
    cfg = dataclasses.replace(
        SMOKE_CFG, generation=GenerationConfig(length_buckets=(4, 8)))
    model = RGRG(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 512, 1)) * 0.3
    max_length = 14  # forces the appended final rung too

    det = model.detect(params, images)
    sel = det["selected_regions"]
    ids_c, dec_c = model.decode_selected_cascade(
        params, det["region_features"], sel, max_length, num_beams=3,
        early_stopping=early_stopping)
    ids_full, dec_full = model.decode_selected(
        params, det["region_features"], sel,
        model.budget_for(int(np.asarray(sel).sum()), 2), max_length,
        num_beams=3, early_stopping=early_stopping)

    np.testing.assert_array_equal(np.asarray(dec_c), np.asarray(dec_full))
    np.testing.assert_array_equal(np.asarray(ids_c), np.asarray(ids_full))


def test_return_done_requires_beam():
    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 512, 1)) * 0.3
    det = model.detect(params, images)
    with pytest.raises(ValueError, match="return_done"):
        model.decode_selected(params, det["region_features"],
                              det["selected_regions"], 8, 8,
                              return_done=True)


def test_beam_done_mask_semantics():
    """Rows reported done by the bucket decode carry the same output as the
    full-length decode even WITHOUT re-decoding (the cascade's core
    assumption, checked directly)."""
    cfg = dataclasses.replace(
        SMOKE_CFG, generation=GenerationConfig(length_buckets=(6,)))
    model = RGRG(cfg=cfg)
    params = model.init(jax.random.PRNGKey(2))
    images = jax.random.normal(jax.random.PRNGKey(3), (2, 512, 512, 1)) * 0.3
    det = model.detect(params, images)
    sel = det["selected_regions"]
    budget = model.budget_for(int(np.asarray(sel).sum()), 2)
    ids_b, dec_b, done_b = model.decode_selected(
        params, det["region_features"], sel, budget, 6, num_beams=3,
        early_stopping=True, return_done=True)
    ids_full, _ = model.decode_selected(
        params, det["region_features"], sel, budget, 12, num_beams=3,
        early_stopping=True)
    ids_b, done_b = np.asarray(ids_b), np.asarray(done_b)
    ids_full = np.asarray(ids_full)
    pad = model.cfg.decoder.pad_token_id
    final = done_b & np.asarray(dec_b) & (ids_b[:, :, 5] == pad)
    for i, r in zip(*np.nonzero(final)):
        np.testing.assert_array_equal(ids_b[i, r], ids_full[i, r, :6])
        assert (ids_full[i, r, 6:] == pad).all()
