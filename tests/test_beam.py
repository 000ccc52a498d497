"""Beam search tests.

Oracle 1: a direct numpy transcription of HF 4.19's BeamSearchScorer
process/finalize semantics driving the numpy forward oracle of the tiny
pseudo-attention model (same weights as the JAX path).
Oracle 2: modern HF GPT2LMHeadModel.generate(num_beams) on a converted tiny
vanilla GPT-2 (no image slot).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
from transformers import GPT2Config, GPT2LMHeadModel

from rgrg_tpu.core.config import DecoderConfig
from rgrg_tpu.core.torch_convert import convert_hf_gpt2_lm, state_dict_to_numpy
from rgrg_tpu.decode.beam import beam_generate
from rgrg_tpu.models import gpt2

from tests.test_gpt2 import TINY, np_forward


def hf_beam_oracle(params, feats, cfg, max_length, num_beams, length_penalty=1.0,
                   early_stopping=False):
    """HF 4.19 beam_search + BeamSearchScorer, in numpy, using np_forward
    for logits (no cache; recompute every step)."""
    b = feats.shape[0]
    k = num_beams
    v = cfg.vocab_size
    seqs = np.full((b * k, 1), cfg.bos_token_id, np.int64)
    feats_x = np.repeat(feats, k, axis=0)
    beam_scores = np.zeros((b, k))
    beam_scores[:, 1:] = -1e9
    beam_scores = beam_scores.reshape(-1)

    hyps = [[] for _ in range(b)]   # list of (score, tokens)
    done = [False] * b

    def hyp_add(bi, tokens, sum_logprobs):
        score = sum_logprobs / (len(tokens) ** length_penalty)
        hyps[bi].append((score, tokens))
        hyps[bi].sort(key=lambda x: -x[0])
        if len(hyps[bi]) > k:
            hyps[bi].pop()

    def hyp_is_done(bi, best_sum_logprobs, cur_len):
        if len(hyps[bi]) < k:
            return False
        if early_stopping:
            return True
        return hyps[bi][-1][0] >= best_sum_logprobs / cur_len ** length_penalty

    cur_len = 1
    while True:
        mask = np.ones(seqs.shape, np.float32)
        logits = np_forward(params, seqs.astype(np.int32), mask, feats_x, cfg)
        nxt = logits[:, -1, :]
        logp = nxt - np.log(np.exp(nxt - nxt.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
            - nxt.max(-1, keepdims=True)
        scores = (logp + beam_scores[:, None]).reshape(b, k * v)
        order = np.argsort(-scores, axis=1, kind="stable")[:, :2 * k]
        next_scores = np.take_along_axis(scores, order, axis=1)
        next_beam = order // v
        next_tok = order % v

        new_scores = np.zeros((b, k))
        new_tok = np.zeros((b, k), np.int64)
        new_idx = np.zeros((b, k), np.int64)
        for bi in range(b):
            if done[bi]:
                new_tok[bi] = cfg.pad_token_id
                new_idx[bi] = 0
                new_scores[bi] = 0
                continue
            slot = 0
            for r in range(2 * k):
                tok = int(next_tok[bi, r])
                if tok == cfg.eos_token_id:
                    if r < k:
                        src = bi * k + int(next_beam[bi, r])
                        hyp_add(bi, seqs[src].tolist(), float(next_scores[bi, r]))
                    continue
                if slot < k:
                    new_scores[bi, slot] = next_scores[bi, r]
                    new_tok[bi, slot] = tok
                    new_idx[bi, slot] = bi * k + int(next_beam[bi, r])
                    slot += 1
                if slot == k:
                    break
            done[bi] = done[bi] or hyp_is_done(bi, float(next_scores[bi].max()), cur_len)

        seqs = np.concatenate([seqs[new_idx.reshape(-1)],
                               new_tok.reshape(-1, 1)], axis=1)
        beam_scores = new_scores.reshape(-1)
        cur_len += 1
        if all(done) or cur_len >= max_length:
            break

    # finalize
    for bi in range(b):
        if not done[bi]:
            for ki in range(k):
                idx = bi * k + ki
                hyp_add(bi, seqs[idx].tolist(), float(beam_scores[idx]))
    out = np.full((b, max_length), cfg.pad_token_id, np.int64)
    for bi in range(b):
        score, tokens = hyps[bi][0]
        out[bi, :len(tokens)] = tokens
        if len(tokens) < max_length:
            out[bi, len(tokens)] = cfg.eos_token_id
    return out


class TestBeamVsHF419Oracle:
    @classmethod
    def setup_class(cls):
        cls.params = gpt2.init_decoder_params(jax.random.PRNGKey(5), TINY)
        rng = np.random.default_rng(5)
        cls.feats = rng.normal(0, 2, (3, TINY.hidden_dim)).astype(np.float32)

    @pytest.mark.parametrize("num_beams,early", [(2, False), (4, False), (4, True)])
    def test_matches_oracle(self, num_beams, early):
        max_length = 12
        got = np.asarray(beam_generate(self.params, jnp.asarray(self.feats),
                                       TINY, max_length=max_length,
                                       num_beams=num_beams, early_stopping=early))
        want = hf_beam_oracle(self.params, self.feats, TINY, max_length,
                              num_beams, early_stopping=early)
        np.testing.assert_array_equal(got, want)

    def test_active_mask(self):
        active = jnp.asarray([True, False, True])
        got = np.asarray(beam_generate(self.params, jnp.asarray(self.feats),
                                       TINY, max_length=8, num_beams=2,
                                       active=active))
        assert (got[1] == TINY.pad_token_id).all()
        want = hf_beam_oracle(self.params, self.feats[[0, 2]], TINY, 8, 2)
        np.testing.assert_array_equal(got[[0, 2]], want)

    @pytest.mark.parametrize("num_beams,early", [(2, False), (4, True)])
    def test_packed_kv_pairs_identical(self, num_beams, early):
        """pack_kv_pairs merges head pairs into the cache's lane dim (halves
        the TPU tiled-layout HBM footprint); the zero-interleaved-query
        contraction must reproduce the standard layout token-for-token."""
        kw = dict(max_length=12, num_beams=num_beams, early_stopping=early)
        feats = jnp.asarray(self.feats)
        want = np.asarray(beam_generate(self.params, feats, TINY, **kw))
        got = np.asarray(beam_generate(self.params, feats, TINY,
                                       pack_kv_pairs=True, **kw))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("num_beams,early", [(2, False), (4, True)])
    def test_pallas_attn_matches_xla(self, num_beams, early):
        """The fused Pallas beam-attention kernel (interpret mode on CPU)
        must reproduce the XLA one-hot path's decode token-for-token."""
        rng = np.random.default_rng(7)
        feats = jnp.asarray(
            rng.normal(0, 2, (4, TINY.hidden_dim)).astype(np.float32))
        kw = dict(max_length=12, num_beams=num_beams, early_stopping=early)
        want = np.asarray(beam_generate(self.params, feats, TINY, **kw))
        got = np.asarray(beam_generate(self.params, feats, TINY,
                                       pallas_attn=True, **kw))
        np.testing.assert_array_equal(got, want)

    def test_pallas_attn_nondivisible_falls_back(self):
        """b=3 does not tile ITEM_BLOCK: pallas_attn must silently use the
        XLA path and still decode identically."""
        feats = jnp.asarray(self.feats)
        kw = dict(max_length=10, num_beams=2)
        want = np.asarray(beam_generate(self.params, feats, TINY, **kw))
        got = np.asarray(beam_generate(self.params, feats, TINY,
                                       pallas_attn=True, **kw))
        np.testing.assert_array_equal(got, want)

    def test_packed_kv_pairs_int8_falls_back(self):
        """int8 caches never pack (scale buffers don't); pack_kv_pairs=True
        must still decode identically to the plain int8 call."""
        feats = jnp.asarray(self.feats)
        kw = dict(max_length=10, num_beams=2, cache_dtype=jnp.int8)
        want = np.asarray(beam_generate(self.params, feats, TINY, **kw))
        got = np.asarray(beam_generate(self.params, feats, TINY,
                                       pack_kv_pairs=True, **kw))
        np.testing.assert_array_equal(got, want)


def test_beam_vs_modern_hf_generate():
    """Vanilla (no-image) beam on converted weights vs transformers
    generate(num_beams=4)."""
    hf_cfg = GPT2Config(vocab_size=61, n_positions=32, n_embd=32, n_layer=2,
                        n_head=4, resid_pdrop=0.0, embd_pdrop=0.0,
                        attn_pdrop=0.0, bos_token_id=0, eos_token_id=0,
                        pad_token_id=0)
    torch.manual_seed(3)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    params = jax.tree.map(jnp.asarray, convert_hf_gpt2_lm(
        state_dict_to_numpy(hf.state_dict()), num_layers=2))
    cfg = DecoderConfig(vocab_size=61, hidden_dim=32, num_heads=4, num_layers=2,
                        max_positions=32, positions_from_wte=False,
                        bos_token_id=0, eos_token_id=0, pad_token_id=0)

    max_length = 14
    with torch.no_grad():
        want = hf.generate(torch.zeros((3, 1), dtype=torch.long),
                           max_length=max_length, num_beams=4,
                           do_sample=False, length_penalty=1.0,
                           early_stopping=False).numpy()

    got = np.asarray(beam_generate(params, None, cfg, max_length=max_length,
                                   num_beams=4, no_image=True, batch=3))
    # HF trims to the longest generated length; compare on that window
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)
    assert (got[:, want.shape[1]:] == 0).all()
