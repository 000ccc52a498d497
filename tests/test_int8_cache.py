"""Quantized (int8) KV cache: structure, dequant fidelity, decode quality."""

import numpy as np
import jax
import jax.numpy as jnp

from rgrg_tpu.decode.greedy import greedy_generate
from rgrg_tpu.models import gpt2

from tests.test_gpt2 import TINY


def test_quantize_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3, 16)) * 3.0
    q, s = gpt2._quantize_kv(x)
    assert q.dtype == jnp.int8
    back = q.astype(jnp.float32) * s
    # absmax per-vector int8: relative error bounded by 1/254 of the range
    err = np.abs(np.asarray(back - x)).max()
    assert err <= float(jnp.max(jnp.abs(x))) / 127.0


def test_int8_cache_structure():
    cache = gpt2.init_cache(2, 8, TINY, jnp.int8)
    assert cache["k"].dtype == jnp.int8
    assert cache["k_scale"].shape == cache["k"].shape[:-1] + (1,)


def test_int8_stepwise_close_to_f32():
    params = gpt2.init_decoder_params(jax.random.PRNGKey(1), TINY)
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, TINY.hidden_dim))

    lg_f, cache_f = gpt2.prefill(params, feats, TINY.bos_token_id, 8, TINY)
    lg_q, cache_q = gpt2.prefill(params, feats, TINY.bos_token_id, 8, TINY,
                                 cache_dtype=jnp.int8)
    np.testing.assert_allclose(np.asarray(lg_f), np.asarray(lg_q), atol=1e-5)

    tok = jnp.argmax(lg_f, axis=-1).astype(jnp.int32)
    for t in range(4):
        lf, cache_f = gpt2.decode_step(params, tok, jnp.int32(t), cache_f, TINY)
        lq, cache_q = gpt2.decode_step(params, tok, jnp.int32(t), cache_q, TINY)
        # int8 kv quantization perturbs logits only slightly
        np.testing.assert_allclose(np.asarray(lq), np.asarray(lf),
                                   rtol=0.1, atol=0.15)
        tok = jnp.argmax(lf, axis=-1).astype(jnp.int32)


def test_int8_greedy_mostly_matches():
    params = gpt2.init_decoder_params(jax.random.PRNGKey(3), TINY)
    feats = jax.random.normal(jax.random.PRNGKey(4), (4, TINY.hidden_dim)) * 2
    a = np.asarray(greedy_generate(params, feats, TINY, max_length=10))
    b = np.asarray(greedy_generate(params, feats, TINY, max_length=10,
                                   cache_dtype=jnp.int8))
    # same shape; most tokens agree (random tiny models have near-tied
    # logits, so occasional divergence is expected)
    assert a.shape == b.shape
    assert (a == b).mean() > 0.6
