"""End-to-end TEXT parity vs HF generate on converted weights, with a
feature-conditioned prefix wired equivalently on both sides.

This is the strongest real-weight-parity proxy available offline (the
published healx checkpoint is not downloadable here): build a random-weight
HF GPT2LMHeadModel + torch adapter modules (feature transform, per-layer
uk/uv — the trainable pieces of reference language_model.py:73-74,229-234),
convert everything into our param tree, and assert greedy AND beam-4 decode
produce token-for-token identical sequences to HF `generate` — compared all
the way through the tokenizer to strings (reference
generate_reports_for_images.py:118 batch_decode).

Conditioning equivalence: the pseudo-attention image slot is exactly one
extra K/V entry at cache position 0 that every query may attend to
(language_model.py:136-154). On the HF side we realize it as a 1-token
`past_key_values` prefix (computed with the same uk/uv/feature-transform
weights) plus a placeholder token covering the cached slot. The one residual
mismatch is position bookkeeping — HF counts the prefix slot as a position,
the reference does not — so the fixture zeroes `wpe` (and our side runs
positions_from_wte=False on the converted zero table), making the offset a
no-op while leaving every other computation live. Beam search needs the
prefix pre-expanded to B*num_beams rows, exactly like the reference's
repeat_interleave (language_model.py:144-147).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
from transformers import DynamicCache, GPT2Config, GPT2LMHeadModel

from rgrg_tpu.core.config import DecoderConfig
from rgrg_tpu.core.torch_convert import convert_hf_gpt2_lm, state_dict_to_numpy
from rgrg_tpu.decode.beam import beam_generate
from rgrg_tpu.decode.greedy import greedy_generate
from rgrg_tpu.text.tokenizer import GPT2Tokenizer

D, L, H, F, B = 32, 2, 4, 24, 4
MAX_LENGTH = 16   # our convention: counts BOS, generates <= MAX_LENGTH-1


class TestHFTextParity:
    @classmethod
    def setup_class(cls):
        cls.tok = GPT2Tokenizer.dummy()
        V = cls.tok.vocab_size          # 257: bytes + one special
        special = cls.tok.eos_token_id  # bos == eos == pad (GPT-2 convention)
        hf_cfg = GPT2Config(vocab_size=V, n_positions=64, n_embd=D,
                            n_layer=L, n_head=H, resid_pdrop=0.0,
                            embd_pdrop=0.0, attn_pdrop=0.0,
                            bos_token_id=special, eos_token_id=special,
                            pad_token_id=special)
        # seed/scale chosen so greedy rows both finish early (EOS mid-
        # sequence) and run to max length — covers finalize AND pad-out
        torch.manual_seed(16)
        cls.hf = GPT2LMHeadModel(hf_cfg).eval()
        with torch.no_grad():
            cls.hf.transformer.wpe.weight.zero_()
            cls.hf.transformer.wte.weight[special] *= 1.32

        cls.ft0 = torch.nn.Linear(F, D)
        cls.ft1 = torch.nn.Linear(D, D)
        cls.uks = [torch.nn.Linear(D, D) for _ in range(L)]
        cls.uvs = [torch.nn.Linear(D, D) for _ in range(L)]
        for m in [cls.ft0, cls.ft1, *cls.uks, *cls.uvs]:
            torch.nn.init.normal_(m.weight, 0, 0.5)
            torch.nn.init.normal_(m.bias, 0, 0.1)
        cls.feats_t = torch.randn(B, F) * 2.0

        def t_lin(m):
            return {"kernel": m.weight.detach().numpy().T,
                    "bias": m.bias.detach().numpy()}

        params = convert_hf_gpt2_lm(state_dict_to_numpy(cls.hf.state_dict()),
                                    num_layers=L)
        params["feature_transform"] = {"fc0": t_lin(cls.ft0),
                                       "fc1": t_lin(cls.ft1)}
        for i in range(L):
            params[f"h_{i}"]["attn"]["uk"] = t_lin(cls.uks[i])
            params[f"h_{i}"]["attn"]["uv"] = t_lin(cls.uvs[i])
        cls.params = jax.tree.map(jnp.asarray, params)
        cls.cfg = DecoderConfig(vocab_size=V, hidden_dim=D, num_heads=H,
                                num_layers=L, max_positions=64,
                                image_feature_dim=F, positions_from_wte=False,
                                bos_token_id=special, eos_token_id=special,
                                pad_token_id=special)
        cls.feats = jnp.asarray(cls.feats_t.numpy())
        cls.special = special

    def _hf_prefix_cache(self, expand: int = 1) -> DynamicCache:
        with torch.no_grad():
            img = self.ft1(torch.relu(self.ft0(self.feats_t)))
            img = img.repeat_interleave(expand, dim=0)
            n = B * expand

            def heads(x):
                return x.view(n, 1, H, D // H).permute(0, 2, 1, 3).contiguous()

            return DynamicCache.from_legacy_cache(tuple(
                (heads(uk(img)), heads(uv(img)))
                for uk, uv in zip(self.uks, self.uvs)))

    def _hf_generate(self, num_beams: int, early_stopping: bool = False):
        # col 0 = placeholder for the cached image slot, col 1 = BOS;
        # max_length+1 accounts for the placeholder column, stripped after
        ids = torch.full((B, 2), self.special, dtype=torch.long)
        am = torch.ones((B, 2), dtype=torch.long)
        with torch.no_grad():
            out = self.hf.generate(
                ids, attention_mask=am,
                past_key_values=self._hf_prefix_cache(max(num_beams, 1)),
                max_length=MAX_LENGTH + 1, do_sample=False,
                num_beams=num_beams, length_penalty=1.0,
                early_stopping=early_stopping)
        return out.numpy()[:, 1:]

    def _assert_text_equal(self, got: np.ndarray, want: np.ndarray):
        w = want.shape[1]
        np.testing.assert_array_equal(got[:, :w], want)
        assert (got[:, w:] == self.special).all()
        got_txt = [self.tok.decode(row, skip_special_tokens=True)
                   for row in got]
        want_txt = [self.tok.decode(row, skip_special_tokens=True)
                    for row in want]
        assert got_txt == want_txt
        return want_txt

    def test_greedy_text_parity(self):
        want = self._hf_generate(num_beams=1)
        got = np.asarray(greedy_generate(self.params, self.feats, self.cfg,
                                         max_length=MAX_LENGTH))
        texts = self._assert_text_equal(got, want)
        lens = [(row != self.special).sum() for row in want]
        # fixture guard: EOS fires mid-sequence somewhere AND some row runs
        # to max length, so both loop exits are genuinely exercised
        assert any(0 < l < MAX_LENGTH - 1 for l in lens), lens
        assert any(l == MAX_LENGTH - 1 for l in lens), lens
        # conditioning guard: rows differ (the prefix actually steers)
        assert len(set(texts)) > 1

    def test_beam4_text_parity_early_stopping(self):
        """Product default: beam-4 + early_stopping=True
        (generate_reports_for_images.py:109-114). Token-for-token and
        string-identical to modern HF generate."""
        want = self._hf_generate(num_beams=4, early_stopping=True)
        got = np.asarray(beam_generate(self.params, self.feats, self.cfg,
                                       max_length=MAX_LENGTH, num_beams=4,
                                       early_stopping=True))
        texts = self._assert_text_equal(got, want)
        assert len(set(texts)) > 1

    def test_beam4_no_early_stopping_is_419_semantics(self):
        """With early_stopping=False the installed transformers (4.57)
        DIVERGES from the 4.19 the reference pins (its is_done heuristic
        changed across the beam-search rewrite; measured here: one row's
        winning hypothesis differs). The reference's behavior is 4.19's, so
        token parity is asserted against the 4.19-transcribed oracle, and
        the modern-HF divergence is pinned as a canary — if HF converges
        again, drop the canary and compare directly."""
        from tests.test_beam import hf_beam_oracle
        params_np = jax.tree.map(np.asarray, self.params)
        want = hf_beam_oracle(params_np, np.asarray(self.feats), self.cfg,
                              MAX_LENGTH, 4, early_stopping=False)
        got = np.asarray(beam_generate(self.params, self.feats, self.cfg,
                                       max_length=MAX_LENGTH, num_beams=4,
                                       early_stopping=False))
        np.testing.assert_array_equal(got, want)
        got_txt = [self.tok.decode(r, skip_special_tokens=True) for r in got]
        want_txt = [self.tok.decode(r, skip_special_tokens=True) for r in want]
        assert got_txt == want_txt
        modern = self._hf_generate(num_beams=4, early_stopping=False)
        assert not np.array_equal(got[:, :modern.shape[1]], modern), \
            "transformers matches 4.19 again - simplify this test"
