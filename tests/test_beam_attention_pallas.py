"""Beam-attention Pallas kernel vs a direct numpy gather oracle.

Oracle semantics: each (item b, beam k) query attends over slots 0..slot of
its ancestry path — K/V taken from lane ancestry[b,k,t] — with standard
softmax attention. The kernel computes this via cross-lane scores + an
additive ancestry bias (softmax over the masked M*T axis is identical)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rgrg_tpu.ops.beam_attention_pallas import ancestry_bias, beam_attention


def oracle(q, k, v, anc, slot, no_image=False):
    bk, h, d = q.shape
    t = k.shape[2]
    b, kb, _ = anc.shape
    out = np.zeros((bk, h, d), np.float32)
    for bi in range(b):
        for ki in range(kb):
            row = bi * kb + ki
            for hi in range(h):
                ks, vs = [], []
                for ti in range(t):
                    if ti > slot or (no_image and ti == 0):
                        continue
                    lane = bi * kb + anc[bi, ki, ti]
                    ks.append(k[lane, hi, ti])
                    vs.append(v[lane, hi, ti])
                ks, vs = np.stack(ks), np.stack(vs)
                s = ks @ q[row, hi] / np.sqrt(d)
                w = np.exp(s - s.max())
                w /= w.sum()
                out[row, hi] = w @ vs
    return out


def make_inputs(b, kb, h, t, d, seed=0, quantized=False):
    """Cache tensors are returned in the kernel's head-leading layout
    [H, BK, T, D] (gpt2.cache_to_beam_layers per-layer buffers); the oracle's kf/vf stay row-major
    [BK, H, T, D]."""
    rng = np.random.default_rng(seed)
    bk = b * kb
    q = rng.normal(0, 1, (bk, h, d)).astype(np.float32)
    anc = rng.integers(0, kb, (b, kb, t)).astype(np.int32)
    if quantized:
        kq = rng.integers(-127, 128, (bk, h, t, d)).astype(np.int8)
        vq = rng.integers(-127, 128, (bk, h, t, d)).astype(np.int8)
        ks = rng.uniform(0.005, 0.02, (bk, h, t, 1)).astype(np.float32)
        vs = rng.uniform(0.005, 0.02, (bk, h, t, 1)).astype(np.float32)
        kf = kq.astype(np.float32) * ks
        vf = vq.astype(np.float32) * vs
        return (q, kq.swapaxes(0, 1), vq.swapaxes(0, 1),
                ks.swapaxes(0, 1), vs.swapaxes(0, 1), kf, vf, anc)
    kf = rng.normal(0, 1, (bk, h, t, d)).astype(np.float32)
    vf = rng.normal(0, 1, (bk, h, t, d)).astype(np.float32)
    return (q, kf.swapaxes(0, 1), vf.swapaxes(0, 1), None, None,
            kf, vf, anc)


@pytest.mark.parametrize("b,kb,tb", [(8, 4, 8), (6, 4, 2), (2, 2, 2), (4, 3, 4)])
def test_kernel_matches_oracle_float(b, kb, tb):
    h, t, d = 2, 11, 8
    q, kk, vv, _, _, kf, vf, anc = make_inputs(b, kb, h, t, d, seed=b)
    slot = 7
    bias = ancestry_bias(jnp.asarray(anc), jnp.int32(slot), item_tile=tb)
    got = np.asarray(beam_attention(jnp.asarray(q), jnp.asarray(kk),
                                    jnp.asarray(vv), bias, interpret=True))
    want = oracle(q, kf, vf, anc, slot)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_kernel_matches_oracle_quantized():
    b, kb, h, t, d = 8, 4, 2, 11, 8
    q, kq, vq, ks, vs, kf, vf, anc = make_inputs(b, kb, h, t, d, seed=3,
                                                 quantized=True)
    slot = 9
    bias = ancestry_bias(jnp.asarray(anc), jnp.int32(slot), item_tile=4)
    got = np.asarray(beam_attention(jnp.asarray(q), jnp.asarray(kq),
                                    jnp.asarray(vq), bias,
                                    jnp.asarray(ks), jnp.asarray(vs),
                                    interpret=True))
    want = oracle(q, kf, vf, anc, slot)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_no_image_masks_slot0():
    b, kb, h, t, d = 2, 2, 1, 6, 4
    q, kk, vv, _, _, kf, vf, anc = make_inputs(b, kb, h, t, d, seed=5)
    slot = 4
    bias = ancestry_bias(jnp.asarray(anc), jnp.int32(slot), no_image=True,
                         item_tile=2)
    got = np.asarray(beam_attention(jnp.asarray(q), jnp.asarray(kk),
                                    jnp.asarray(vv), bias, interpret=True))
    want = oracle(q, kf, vf, anc, slot, no_image=True)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_decode_step_beam_pallas_matches_fallback():
    """Full decode step: interpret-mode pallas == XLA one-hot fallback."""
    from rgrg_tpu.core.config import DecoderConfig
    from rgrg_tpu.models import gpt2
    import functools

    cfg = DecoderConfig(vocab_size=64, hidden_dim=32, num_heads=4,
                        num_layers=2, max_positions=32,
                        image_feature_dim=16, bos_token_id=0,
                        eos_token_id=0, pad_token_id=0)
    b, kb, t = 4, 2, 10
    params = gpt2.init_decoder_params(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (b * kb, 16))
    _, cache = gpt2.prefill(params, feats, 0, t - 1, cfg)
    cache = gpt2.cache_to_beam_layers(cache)
    rng = np.random.default_rng(0)
    anc = rng.integers(0, kb, (b, kb, t)).astype(np.int32)
    # beam_generate invariant (reorder_ancestry): the slot being written
    # this step (step 0 -> slot 2) maps each beam to its OWN lane — the
    # fallback path relies on it for its explicit self-attention term
    anc[:, :, 2] = np.arange(kb)
    anc = jnp.asarray(anc)
    tok = jnp.asarray(rng.integers(0, 64, (b * kb,)).astype(np.int32))

    step_fb = functools.partial(gpt2.decode_step_beam, params, tok,
                                jnp.int32(0), cache, anc, cfg)
    logits_fb, cache_fb = step_fb(use_pallas=False)

    # interpret-mode pallas path (monkeypatch the kernel entry)
    import rgrg_tpu.ops.beam_attention_pallas as bap
    orig = bap.beam_attention
    try:
        bap.beam_attention = functools.partial(orig, interpret=True)
        logits_pl, cache_pl = step_fb(use_pallas=True)
    finally:
        bap.beam_attention = orig

    np.testing.assert_allclose(np.asarray(logits_pl), np.asarray(logits_fb),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache_pl["k_0"]),
                               np.asarray(cache_fb["k_0"]), rtol=1e-5, atol=1e-5)
