"""Sampling decoder tests."""

import numpy as np
import jax
import jax.numpy as jnp

from rgrg_tpu.decode.greedy import greedy_generate
from rgrg_tpu.decode.sample import _filter_logits, sample_generate
from rgrg_tpu.models import gpt2

from tests.test_gpt2 import TINY


def test_top_k_filtering():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    out = np.asarray(_filter_logits(logits, top_k=2, top_p=1.0))
    assert np.isfinite(out[0, 1]) and np.isfinite(out[0, 2])
    assert np.isinf(out[0, 0]) and np.isinf(out[0, 3])


def test_top_p_keeps_top1():
    logits = jnp.asarray([[10.0, 0.0, -10.0]])
    out = np.asarray(_filter_logits(logits, top_k=0, top_p=0.01))
    assert np.isfinite(out[0, 0])
    assert np.isinf(out[0, 1]) and np.isinf(out[0, 2])


def test_top_k1_equals_greedy():
    params = gpt2.init_decoder_params(jax.random.PRNGKey(0), TINY)
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, TINY.hidden_dim))
    want = np.asarray(greedy_generate(params, feats, TINY, max_length=8))
    got = np.asarray(sample_generate(params, feats, jax.random.PRNGKey(2),
                                     TINY, max_length=8, top_k=1))
    np.testing.assert_array_equal(got, want)


def test_sampling_varies_with_seed():
    params = gpt2.init_decoder_params(jax.random.PRNGKey(0), TINY)
    feats = jax.random.normal(jax.random.PRNGKey(1), (4, TINY.hidden_dim))
    a = np.asarray(sample_generate(params, feats, jax.random.PRNGKey(2),
                                   TINY, max_length=10, temperature=2.0))
    b = np.asarray(sample_generate(params, feats, jax.random.PRNGKey(3),
                                   TINY, max_length=10, temperature=2.0))
    assert (a != b).any()
    # BOS column fixed
    assert (a[:, 0] == TINY.bos_token_id).all()


def test_active_mask():
    params = gpt2.init_decoder_params(jax.random.PRNGKey(0), TINY)
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, TINY.hidden_dim))
    active = jnp.asarray([True, False, True])
    out = np.asarray(sample_generate(params, feats, jax.random.PRNGKey(2),
                                     TINY, max_length=8, active=active))
    assert (out[1, 1:] == TINY.pad_token_id).all()
