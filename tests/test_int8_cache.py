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


def test_int8_packed_greedy_mostly_matches_unpacked():
    """Packed int8 quantizes per PACKED ROW (one absmax over the head pair
    — scale buffers keep their trailing-1 broadcast shape, see
    gpt2.init_cache), so tokens can differ from the per-head unpacked
    quantization on near-ties; sequences must still largely agree, and
    both must stay close to the f32 decode."""
    params = gpt2.init_decoder_params(jax.random.PRNGKey(3), TINY)
    feats = jax.random.normal(jax.random.PRNGKey(4), (4, TINY.hidden_dim)) * 2
    f = np.asarray(greedy_generate(params, feats, TINY, max_length=10))
    a = np.asarray(greedy_generate(params, feats, TINY, max_length=10,
                                   cache_dtype=jnp.int8, pack_kv_pairs=False))
    b = np.asarray(greedy_generate(params, feats, TINY, max_length=10,
                                   cache_dtype=jnp.int8, pack_kv_pairs=True))
    assert (a == b).mean() > 0.6
    assert (b == f).mean() > 0.6


def test_int8_packed_stepwise_close_to_f32():
    params = gpt2.init_decoder_params(jax.random.PRNGKey(1), TINY)
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, TINY.hidden_dim))
    lg_f, cache_f = gpt2.prefill(params, feats, TINY.bos_token_id, 8, TINY,
                                 pack_pairs=True)
    lg_q, cache_q = gpt2.prefill(params, feats, TINY.bos_token_id, 8, TINY,
                                 cache_dtype=jnp.int8, pack_pairs=True)
    np.testing.assert_allclose(np.asarray(lg_f), np.asarray(lg_q), atol=1e-5)
    tok = jnp.argmax(lg_f, axis=-1).astype(jnp.int32)
    for t in range(4):
        lf, cache_f = gpt2.decode_step(params, tok, jnp.int32(t), cache_f, TINY)
        lq, cache_q = gpt2.decode_step(params, tok, jnp.int32(t), cache_q, TINY)
        np.testing.assert_allclose(np.asarray(lq), np.asarray(lf),
                                   rtol=0.1, atol=0.15)
        tok = jnp.argmax(lf, axis=-1).astype(jnp.int32)


def test_int8_packed_cache_structure():
    cache = gpt2.init_cache(2, 8, TINY, jnp.int8, pack_pairs=True)
    assert cache["k"].shape == (TINY.num_layers, 2, TINY.num_heads // 2,
                                9, 2 * TINY.head_dim)
    assert cache["k_scale"].shape == cache["k"].shape[:-1] + (1,)


def test_int8_beam_step_close_to_f32():
    """decode_step_beam's quantized write/dequant-read path vs the f32 cache
    (the serving/bench default for beam is the int8 cache — the mechanism
    needs its own oracle, not just the greedy path's)."""
    params = gpt2.init_decoder_params(jax.random.PRNGKey(5), TINY)
    b, kb, t = 2, 2, 9
    feats = jax.random.normal(jax.random.PRNGKey(6), (b * kb, TINY.hidden_dim))

    _, cache_f = gpt2.prefill(params, feats, TINY.bos_token_id, t - 1, TINY)
    _, cache_q = gpt2.prefill(params, feats, TINY.bos_token_id, t - 1, TINY,
                              cache_dtype=jnp.int8)
    cache_f = gpt2.cache_to_beam_layers(cache_f)
    cache_q = gpt2.cache_to_beam_layers(cache_q)
    assert cache_q["k_0"].dtype == jnp.int8
    assert cache_q["k_scale_0"].shape == cache_q["k_0"].shape[:-1] + (1,)

    rng = np.random.default_rng(0)
    anc = rng.integers(0, kb, (b, kb, t)).astype(np.int32)
    tok = jnp.asarray(rng.integers(0, TINY.vocab_size, (b * kb,)), jnp.int32)
    for step in range(3):
        anc[:, :, step + 2] = np.arange(kb)  # reorder_ancestry invariant
        lf, cache_f = gpt2.decode_step_beam(params, tok, jnp.int32(step),
                                            cache_f, jnp.asarray(anc), TINY)
        lq, cache_q = gpt2.decode_step_beam(params, tok, jnp.int32(step),
                                            cache_q, jnp.asarray(anc), TINY)
        np.testing.assert_allclose(np.asarray(lq), np.asarray(lf),
                                   rtol=0.1, atol=0.15)
        tok = jnp.argmax(lf, axis=-1).astype(jnp.int32)


def test_int8_beam_generate_mostly_matches():
    """Full beam_generate with cache_dtype=int8 vs f32: quantization noise
    may flip occasional near-tie tokens but the sequences must be largely
    identical on a tiny model."""
    from rgrg_tpu.decode.beam import beam_generate

    params = gpt2.init_decoder_params(jax.random.PRNGKey(7), TINY)
    feats = jax.random.normal(jax.random.PRNGKey(8), (3, TINY.hidden_dim)) * 2
    ids_f = beam_generate(params, feats, TINY, max_length=10, num_beams=2)
    ids_q = beam_generate(params, feats, TINY, max_length=10, num_beams=2,
                          cache_dtype=jnp.int8)
    agree = float(np.mean(np.asarray(ids_f) == np.asarray(ids_q)))
    assert agree >= 0.8, f"int8 beam diverged too far: agreement {agree}"
