"""GPT-2 pseudo-attention decoder tests.

Oracle: an independent numpy implementation of pseudo self-attention
(Encoder-Agnostic Adaptation semantics) for a tiny config, plus internal
consistency between the cached decode path and the full forward.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from rgrg_tpu.core.config import DecoderConfig
from rgrg_tpu.decode.greedy import greedy_generate
from rgrg_tpu.models import gpt2

TINY = DecoderConfig(vocab_size=50, hidden_dim=16, num_heads=2, num_layers=2,
                     max_positions=64, bos_token_id=0, eos_token_id=0,
                     pad_token_id=0, image_feature_dim=16)


def np_layer_norm(x, p, eps):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * p["scale"] + p["bias"]


def np_gelu_new(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def np_forward(params, ids, mask, feats, cfg: DecoderConfig):
    """Scalar-ish numpy oracle of forward_full."""
    p = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    b, s = ids.shape
    d, nh = cfg.hidden_dim, cfg.num_heads
    hd = d // nh

    ft = p["feature_transform"]
    img = np.maximum(feats @ ft["fc0"]["kernel"] + ft["fc0"]["bias"], 0)
    img = img @ ft["fc1"]["kernel"] + ft["fc1"]["bias"]  # [B, D]

    pos_table = p["wte" if cfg.positions_from_wte else "wpe"]["embedding"]
    x = p["wte"]["embedding"][ids] + pos_table[np.arange(s)][None]

    for li in range(cfg.num_layers):
        bp = p[f"h_{li}"]
        k_img = (img @ bp["attn"]["uk"]["kernel"] + bp["attn"]["uk"]["bias"])
        v_img = (img @ bp["attn"]["uv"]["kernel"] + bp["attn"]["uv"]["bias"])
        xn = np_layer_norm(x, bp["ln_1"], cfg.layer_norm_eps)
        qkv = xn @ bp["attn"]["c_attn"]["kernel"] + bp["attn"]["c_attn"]["bias"]
        q, kw, vw = np.split(qkv, 3, axis=-1)
        k = np.concatenate([k_img[:, None], kw], axis=1)  # [B, 1+S, D]
        v = np.concatenate([v_img[:, None], vw], axis=1)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], nh, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        w = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(hd)  # [B,H,S,1+S]
        # causal with always-visible image column
        causal = np.tril(np.ones((s, s), bool))
        causal = np.concatenate([np.ones((s, 1), bool), causal], axis=1)
        w = np.where(causal[None, None], w, -1e4)
        pad = np.concatenate([np.ones((b, 1)), mask], axis=1)
        w = w + (1.0 - pad)[:, None, None, :] * -1e4
        w = np.exp(w - w.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        a = (w @ vh).transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + (a @ bp["attn"]["c_proj"]["kernel"] + bp["attn"]["c_proj"]["bias"])
        mn = np_layer_norm(x, bp["ln_2"], cfg.layer_norm_eps)
        m = np_gelu_new(mn @ bp["mlp"]["c_fc"]["kernel"] + bp["mlp"]["c_fc"]["bias"])
        x = x + (m @ bp["mlp"]["c_proj"]["kernel"] + bp["mlp"]["c_proj"]["bias"])

    x = np_layer_norm(x, p["ln_f"], cfg.layer_norm_eps)
    return x @ p["wte"]["embedding"].T


class TestForward:
    @classmethod
    def setup_class(cls):
        cls.params = gpt2.init_decoder_params(jax.random.PRNGKey(0), TINY)
        rng = np.random.default_rng(0)
        cls.ids = rng.integers(1, TINY.vocab_size, (3, 7)).astype(np.int32)
        cls.mask = np.ones((3, 7), np.float32)
        cls.mask[1, 5:] = 0  # padded row
        cls.feats = rng.normal(0, 1, (3, TINY.hidden_dim)).astype(np.float32)

    def test_full_forward_matches_oracle(self):
        got = gpt2.forward_full(self.params, jnp.asarray(self.ids),
                                jnp.asarray(self.mask), jnp.asarray(self.feats), TINY)
        want = np_forward(self.params, self.ids, self.mask, self.feats, TINY)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_positions_from_wte_quirk_changes_output(self):
        cfg_wpe = dataclasses.replace(TINY, positions_from_wte=False)
        a = gpt2.forward_full(self.params, jnp.asarray(self.ids),
                              jnp.asarray(self.mask), jnp.asarray(self.feats), TINY)
        b = gpt2.forward_full(self.params, jnp.asarray(self.ids),
                              jnp.asarray(self.mask), jnp.asarray(self.feats), cfg_wpe)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3

    def test_image_conditioning_matters(self):
        other = gpt2.forward_full(self.params, jnp.asarray(self.ids),
                                  jnp.asarray(self.mask),
                                  jnp.asarray(self.feats + 100.0), TINY)
        base = gpt2.forward_full(self.params, jnp.asarray(self.ids),
                                 jnp.asarray(self.mask), jnp.asarray(self.feats), TINY)
        assert np.abs(np.asarray(other) - np.asarray(base)).max() > 1e-5

    def test_loss_ignores_padding(self):
        ids = jnp.asarray(self.ids)
        mask = jnp.asarray(self.mask)
        feats = jnp.asarray(self.feats)
        loss = gpt2.language_model_loss(self.params, ids, mask, feats, TINY)
        # corrupt a padded position -> loss unchanged
        ids2 = ids.at[1, 6].set(17)
        loss2 = gpt2.language_model_loss(self.params, ids2, mask, feats, TINY)
        np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-6)
        # corrupt a real position -> loss changes
        ids3 = ids.at[0, 3].set((int(ids[0, 3]) + 1) % TINY.vocab_size)
        loss3 = gpt2.language_model_loss(self.params, ids3, mask, feats, TINY)
        assert abs(float(loss) - float(loss3)) > 1e-6


class TestCachedDecode:
    """Cached prefill+decode must reproduce teacher-forced full-forward
    logits position by position."""

    @classmethod
    def setup_class(cls):
        cls.params = gpt2.init_decoder_params(jax.random.PRNGKey(1), TINY)
        rng = np.random.default_rng(1)
        cls.feats = rng.normal(0, 1, (2, TINY.hidden_dim)).astype(np.float32)

    def test_stepwise_matches_full(self):
        steps = 6
        logits0, cache = gpt2.prefill(self.params, jnp.asarray(self.feats),
                                      TINY.bos_token_id, steps + 2, TINY)
        tokens = [jnp.full((2,), TINY.bos_token_id, jnp.int32)]
        step_logits = [logits0]
        tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
        for t in range(steps):
            tokens.append(tok)
            lg, cache = gpt2.decode_step(self.params, tok, jnp.int32(t), cache, TINY)
            step_logits.append(lg)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        seq = jnp.stack(tokens, axis=1)  # [2, steps+1]
        full = gpt2.forward_full(self.params, seq,
                                 jnp.ones(seq.shape, jnp.float32),
                                 jnp.asarray(self.feats), TINY)
        for i, lg in enumerate(step_logits):
            np.testing.assert_allclose(np.asarray(lg), np.asarray(full[:, i, :]),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"step {i}")

    def test_stepwise_packed_matches_full(self):
        # head-pair-packed cache ([L,B,H/2,T,2D]) must reproduce the same
        # teacher-forced logits: the packed contraction's cross-head lane
        # products hit structural zeros, so it is exact.
        steps = 6
        logits0, cache = gpt2.prefill(self.params, jnp.asarray(self.feats),
                                      TINY.bos_token_id, steps + 2, TINY,
                                      pack_pairs=True)
        assert cache["k"].shape[-1] == 2 * TINY.head_dim
        tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
        step_logits = [logits0]
        tokens = [jnp.full((2,), TINY.bos_token_id, jnp.int32)]
        for t in range(steps):
            tokens.append(tok)
            lg, cache = gpt2.decode_step(self.params, tok, jnp.int32(t), cache, TINY)
            step_logits.append(lg)
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        seq = jnp.stack(tokens, axis=1)
        full = gpt2.forward_full(self.params, seq,
                                 jnp.ones(seq.shape, jnp.float32),
                                 jnp.asarray(self.feats), TINY)
        for i, lg in enumerate(step_logits):
            np.testing.assert_allclose(np.asarray(lg), np.asarray(full[:, i, :]),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"packed step {i}")

    def test_greedy_packed_kv_identical(self):
        packed = greedy_generate(self.params, jnp.asarray(self.feats), TINY,
                                 max_length=9, pack_kv_pairs=True)
        plain = greedy_generate(self.params, jnp.asarray(self.feats), TINY,
                                max_length=9, pack_kv_pairs=False)
        np.testing.assert_array_equal(np.asarray(packed), np.asarray(plain))

    def test_greedy_generate_matches_manual_loop(self):
        max_length = 9
        out = greedy_generate(self.params, jnp.asarray(self.feats), TINY,
                              max_length=max_length)
        assert out.shape == (2, max_length)
        # manual teacher-forced replay: each output token must be the argmax
        # of full-forward logits at the previous position (until eos)
        out_np = np.asarray(out)
        full = gpt2.forward_full(self.params, jnp.asarray(out_np),
                                 jnp.ones_like(out_np, dtype=jnp.float32),
                                 jnp.asarray(self.feats), TINY)
        full = np.asarray(full)
        for b in range(2):
            for t in range(1, max_length):
                want = int(np.argmax(full[b, t - 1]))
                if want == TINY.eos_token_id:
                    assert (out_np[b, t:] == TINY.pad_token_id).all()
                    break
                assert out_np[b, t] == want, (b, t)


class TestDropout:
    def test_dropout_rng_changes_output_deterministically(self):
        params = gpt2.init_decoder_params(jax.random.PRNGKey(0), TINY)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1, TINY.vocab_size, (2, 5)).astype(np.int32))
        mask = jnp.ones((2, 5), jnp.float32)
        feats = jnp.asarray(rng.normal(0, 1, (2, TINY.hidden_dim)).astype(np.float32))

        base = gpt2.forward_full(params, ids, mask, feats, TINY)
        d1 = gpt2.forward_full(params, ids, mask, feats, TINY,
                               dropout_rng=jax.random.PRNGKey(1))
        d1b = gpt2.forward_full(params, ids, mask, feats, TINY,
                                dropout_rng=jax.random.PRNGKey(1))
        d2 = gpt2.forward_full(params, ids, mask, feats, TINY,
                               dropout_rng=jax.random.PRNGKey(2))
        assert np.abs(np.asarray(d1) - np.asarray(base)).max() > 1e-4
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))
        assert np.abs(np.asarray(d1) - np.asarray(d2)).max() > 1e-4

    def test_zero_rates_match_deterministic(self):
        import dataclasses as dc
        cfg0 = dc.replace(TINY, embd_dropout=0.0, attn_dropout=0.0,
                          resid_dropout=0.0)
        params = gpt2.init_decoder_params(jax.random.PRNGKey(0), cfg0)
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(1, cfg0.vocab_size, (2, 4)).astype(np.int32))
        mask = jnp.ones((2, 4), jnp.float32)
        feats = jnp.asarray(rng.normal(0, 1, (2, cfg0.hidden_dim)).astype(np.float32))
        a = gpt2.forward_full(params, ids, mask, feats, cfg0)
        b = gpt2.forward_full(params, ids, mask, feats, cfg0,
                              dropout_rng=jax.random.PRNGKey(5))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
