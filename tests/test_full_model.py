"""Full-pipeline composition tests (tiny configs, CPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from rgrg_tpu.core.config import (DecoderConfig, DetectorConfig, ModelConfig,
                                  RPNConfig)
from rgrg_tpu.decode.greedy import greedy_generate
from rgrg_tpu.models import gpt2
from rgrg_tpu.models.full_model import RGRG

TINY_DEC = DecoderConfig(vocab_size=50, hidden_dim=16, num_heads=2, num_layers=2,
                         max_positions=64, bos_token_id=0, eos_token_id=0,
                         pad_token_id=0, image_feature_dim=16)
TINY_CFG = ModelConfig(
    detector=DetectorConfig(rpn=RPNConfig(pre_nms_top_n_test=32,
                                          post_nms_top_n_test=32)),
    decoder=TINY_DEC,
)
# for the end-to-end smoke: real detector (1024-d features) + tiny decoder
SMOKE_CFG = dataclasses.replace(
    TINY_CFG, decoder=dataclasses.replace(TINY_DEC, image_feature_dim=1024))


class TestDecodeSelected:
    @classmethod
    def setup_class(cls):
        cls.model = RGRG(cfg=TINY_CFG)
        cls.dec_params = gpt2.init_decoder_params(jax.random.PRNGKey(0), TINY_DEC)
        cls.params = {"decoder": cls.dec_params}
        rng = np.random.default_rng(0)
        cls.feats = rng.normal(0, 1, (2, 29, 16)).astype(np.float32)

    def test_scatter_matches_direct_decode(self):
        sel = np.zeros((2, 29), bool)
        sel[0, [1, 5, 7]] = True
        sel[1, [0, 28]] = True
        out, decoded = self.model.decode_selected(
            self.params, jnp.asarray(self.feats), jnp.asarray(sel),
            r_budget=8, max_length=6)
        out, decoded = np.asarray(out), np.asarray(decoded)
        np.testing.assert_array_equal(decoded, sel)
        # direct decode of each selected feature must give the same ids
        for b, r in zip(*np.nonzero(sel)):
            direct = greedy_generate(self.dec_params,
                                     jnp.asarray(self.feats[b, r][None]),
                                     TINY_DEC, max_length=6)
            np.testing.assert_array_equal(out[b, r], np.asarray(direct)[0])
        # non-selected regions all padding
        assert (out[~sel] == TINY_DEC.pad_token_id).all()

    def test_budget_smaller_than_selection_truncates(self):
        sel = np.zeros((2, 29), bool)
        sel[0, :5] = True
        out, decoded = self.model.decode_selected(
            self.params, jnp.asarray(self.feats), jnp.asarray(sel),
            r_budget=3, max_length=6)
        assert np.asarray(decoded).sum() == 3
        # compaction preserves flattened order: first 3 selected fit
        assert np.asarray(decoded)[0, :3].all()

    def test_empty_selection(self):
        sel = np.zeros((2, 29), bool)
        out, decoded = self.model.decode_selected(
            self.params, jnp.asarray(self.feats), jnp.asarray(sel),
            r_budget=8, max_length=6)
        assert not np.asarray(decoded).any()
        assert (np.asarray(out) == TINY_DEC.pad_token_id).all()

    def test_budget_picker(self):
        m = self.model
        assert m.budget_for(0, 1) == 8
        assert m.budget_for(9, 4) == 12
        assert m.budget_for(100, 4) == 4 * 29
        # {2^k, 3*2^k} ladder
        got = [m.budget_for(n, 100) for n in (8, 13, 20, 40, 100, 150)]
        assert got == [8, 16, 24, 48, 128, 192]


def test_end_to_end_generate_smoke():
    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 512, 1)) * 0.3
    out = model.generate(params, images, max_length=5)
    assert out["output_ids"].shape == (1, 29, 5)
    assert out["selected_regions"].shape == (1, 29)
    assert out["detections"]["top_region_boxes"].shape == (1, 29, 4)
    # decoded rows are exactly the selected ones (budget is always >= count)
    np.testing.assert_array_equal(out["decoded_mask"], out["selected_regions"])


def test_detect_image_chunk_matches_unchunked():
    """image_chunk runs the detector over lax.map'd sub-batches with
    identical per-image math: every detect output must match the unchunked
    forward exactly (same dtype path, just bounded peak memory)."""
    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(2), (4, 512, 512, 1)) * 0.3
    full = jax.device_get(model.detect(params, images))
    chunked = jax.device_get(model.detect(params, images, image_chunk=2))
    assert set(full) == set(chunked)
    for k in full:
        np.testing.assert_array_equal(full[k], chunked[k], err_msg=k)
    # non-dividing / oversize chunk sizes fall back to the unchunked graph
    odd = jax.device_get(model.detect(params, images, image_chunk=3))
    for k in full:
        np.testing.assert_array_equal(full[k], odd[k], err_msg=k)


def test_detect_and_decode_image_chunk_matches():
    model = RGRG(cfg=SMOKE_CFG)
    params = model.init(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(3), (4, 512, 512, 1)) * 0.3
    sel = np.zeros((4, 29), bool)
    sel[:, [1, 4]] = True
    sel = jnp.asarray(sel)
    a = jax.device_get(model.detect_and_decode(params, images, sel, 8, 5))
    b = jax.device_get(model.detect_and_decode(params, images, sel, 8, 5,
                                               image_chunk=2))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
