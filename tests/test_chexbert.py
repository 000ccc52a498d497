"""CheXbert tests: BERT encoder parity vs HF BertModel, converter,
CE metric formulas vs sklearn, WordPiece tokenizer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
from sklearn.metrics import accuracy_score, precision_recall_fscore_support
from transformers import BertConfig as HFBertConfig, BertModel

from rgrg_tpu.eval import chexbert as cx
from rgrg_tpu.text.wordpiece import WordPieceTokenizer, basic_tokenize


def small_cfg():
    return cx.BertConfig(vocab_size=99, hidden=32, layers=2, heads=4,
                         intermediate=64, max_positions=48)


def test_bert_encoder_parity_with_hf():
    hf_cfg = HFBertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=64,
                          max_position_embeddings=48,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()

    sd = {f"bert.{k}": v.numpy() for k, v in hf.state_dict().items()}
    # add fake heads so the converter sees a full CheXbert state dict
    rng = np.random.default_rng(0)
    for j in range(14):
        n = 2 if j == 13 else 4
        sd[f"linear_heads.{j}.weight"] = rng.normal(0, 0.1, (n, 32)).astype(np.float32)
        sd[f"linear_heads.{j}.bias"] = np.zeros(n, np.float32)
    params = jax.tree.map(jnp.asarray, cx.convert_chexbert(sd))

    ids = rng.integers(0, 99, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    got = cx.bert_encode(params["bert"], jnp.asarray(ids.astype(np.int32)),
                         jnp.asarray(mask.astype(np.float32)), small_cfg())
    # padded positions' outputs can differ; compare valid positions
    np.testing.assert_allclose(np.asarray(got)[0], want[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got)[1, :6], want[1, :6], rtol=2e-4, atol=2e-4)

    labels = cx.chexbert_label(params, jnp.asarray(ids.astype(np.int32)),
                               jnp.asarray(mask.astype(np.float32)), small_cfg())
    assert labels.shape == (14, 2)
    assert labels[13].max() <= 1  # binary "No Finding" head


def test_dataparallel_prefix_stripped():
    hf_cfg = HFBertConfig(vocab_size=20, hidden_size=16, num_hidden_layers=1,
                          num_attention_heads=2, intermediate_size=32,
                          max_position_embeddings=16)
    hf = BertModel(hf_cfg)
    sd = {f"module.bert.{k}": v.numpy() for k, v in hf.state_dict().items()}
    rng = np.random.default_rng(1)
    for j in range(14):
        n = 2 if j == 13 else 4
        sd[f"module.linear_heads.{j}.weight"] = rng.normal(0, 0.1, (n, 16)).astype(np.float32)
        sd[f"module.linear_heads.{j}.bias"] = np.zeros(n, np.float32)
    params = cx.convert_chexbert(sd)
    assert "layer_0" in params["bert"] and 13 in params["heads"]


class TestCEScores:
    def _random_labels(self, seed):
        rng = np.random.default_rng(seed)
        return (rng.integers(0, 4, (14, 40)), rng.integers(0, 4, (14, 40)))

    @pytest.mark.parametrize("seed", [0, 1])
    def test_micro_matches_sklearn(self, seed):
        gen, ref = self._random_labels(seed)
        out = cx.compute_ce_scores(gen, ref)
        g = cx.miura_convert(gen).ravel()
        r = cx.miura_convert(ref).ravel()
        p, rec, f1, _ = precision_recall_fscore_support(r, g, average="binary",
                                                        zero_division=0)
        assert out["precision_micro_all"] == pytest.approx(p)
        assert out["recall_micro_all"] == pytest.approx(rec)
        assert out["f1_micro_all"] == pytest.approx(f1)
        assert out["acc_micro_all"] == pytest.approx(accuracy_score(r, g))

    def test_per_condition_and_5(self, ):
        gen, ref = self._random_labels(3)
        out = cx.compute_ce_scores(gen, ref)
        assert set(out["per_condition"]) == set(cx.CONDITIONS)
        # micro-5 over the Miura-selected rows
        mask5 = np.array([c in cx.FIVE_CONDITIONS for c in cx.CONDITIONS])
        g = cx.miura_convert(gen)[mask5].ravel()
        r = cx.miura_convert(ref)[mask5].ravel()
        p, rec, f1, _ = precision_recall_fscore_support(r, g, average="binary",
                                                        zero_division=0)
        assert out["f1_micro_5"] == pytest.approx(f1)

    def test_example_based_nan_to_zero(self):
        gen = np.zeros((14, 3), int)  # no positives anywhere
        ref = np.zeros((14, 3), int)
        out = cx.compute_ce_scores(gen, ref)
        assert out["precision_example_all"] == 0.0
        assert out["acc_example_all"] == 1.0


class TestWordPiece:
    VOCAB = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "heart", "is", "normal",
         "lung", "##s", "pleu", "##ral", "effusion", ".", ","])}

    def test_basic(self):
        tok = WordPieceTokenizer(self.VOCAB)
        assert tok.tokenize("The lungs, pleural effusion.") == [
            "the", "lung", "##s", ",", "pleu", "##ral", "effusion", "."]

    def test_unknown(self):
        tok = WordPieceTokenizer(self.VOCAB)
        assert tok.tokenize("xyzzy") == ["[UNK]"]

    def test_encode_wrap_and_truncate(self):
        tok = WordPieceTokenizer(self.VOCAB)
        ids = tok.encode("the heart is normal .")
        assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
        long = tok.encode(" ".join(["heart"] * 600), max_len=512)
        assert len(long) == 512 and long[-1] == tok.sep_id

    def test_accent_and_case(self):
        assert basic_tokenize("Héllo WORLD") == ["hello", "world"]

    def test_batch_padding(self):
        tok = WordPieceTokenizer(self.VOCAB)
        ids, mask = tok.encode_batch(["the heart", "the"])
        assert len(ids[0]) == len(ids[1])
        assert mask[1][-1] == 0
