"""BERTScore soft-dedup tests.

Oracles:
  * encoder parity: HF DistilBertModel (torch, random weights) hidden states
    after layer k == our converted bert_encode truncated to k layers,
  * greedy-matching F1: naive per-pair python loops over the SAME HF torch
    embeddings (reference semantics: bert_score greedy cosine matching with
    [CLS]/[SEP]/pad weighted 0 — generate_reports_for_images.py:60-96),
  * behavior: near-duplicate sentences (tokenize-identical, string-distinct)
    get F1 == 1 > 0.9 and the SHORTER one is removed from the report.
"""

import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest
import torch
from transformers import DistilBertConfig as HFDistilBertConfig
from transformers import DistilBertModel

from rgrg_tpu.eval import bertscore as bs
from rgrg_tpu.eval.chexbert import BertConfig
from rgrg_tpu.text.report import assemble_report, remove_duplicate_sentences
from rgrg_tpu.text.wordpiece import WordPieceTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "lung", "lungs", "are",
         "is", "clear", "no", "pleural", "effusion", "seen", "heart", "size",
         "normal", "within", "limits", "of", ".", ",", "cardiac", "silhouette",
         "stable", "acute", "process", "there"]


def small_hf(seed=0):
    cfg = HFDistilBertConfig(vocab_size=len(VOCAB), dim=32, n_layers=3,
                             n_heads=4, hidden_dim=64,
                             max_position_embeddings=48, dropout=0.0,
                             attention_dropout=0.0)
    torch.manual_seed(seed)
    return DistilBertModel(cfg).eval()


def small_cfg():
    return BertConfig(vocab_size=len(VOCAB), hidden=32, layers=3, heads=4,
                      intermediate=64, max_positions=48)


def make_tokenizer():
    return WordPieceTokenizer({w: i for i, w in enumerate(VOCAB)})


def make_scorer(seed=0, layer=2):
    hf = small_hf(seed)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = bs.convert_distilbert(sd)
    return hf, bs.BERTScorer(params, make_tokenizer(), cfg=small_cfg(),
                             layer=layer)


def hf_hidden(hf, ids, mask, layer):
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask),
                 output_hidden_states=True)
    return out.hidden_states[layer].numpy()


def naive_pair_f1(emb_a, w_a, emb_b, w_b):
    """Plain-loop bert_score greedy matching (one pair)."""
    ea = emb_a / np.maximum(np.linalg.norm(emb_a, axis=-1, keepdims=True), 1e-12)
    eb = emb_b / np.maximum(np.linalg.norm(emb_b, axis=-1, keepdims=True), 1e-12)
    sim = ea @ eb.T
    ia = [i for i in range(len(w_a)) if w_a[i] > 0]
    ib = [j for j in range(len(w_b)) if w_b[j] > 0]
    p = float(np.mean([max(sim[i, j] for j in ib) for i in ia]))
    r = float(np.mean([max(sim[i, j] for i in ia) for j in ib]))
    return 2 * p * r / (p + r) if p + r > 0 else 0.0


def test_distilbert_encoder_parity_with_hf():
    hf, scorer = make_scorer(seed=0, layer=2)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, len(VOCAB), (2, 11)).astype(np.int64)
    mask = np.ones((2, 11), np.int64)
    mask[1, 7:] = 0
    want = hf_hidden(hf, ids, mask, layer=2)
    want = want / np.maximum(np.linalg.norm(want, axis=-1, keepdims=True), 1e-12)
    got = np.asarray(bs._embed(scorer.params, jnp.asarray(ids, jnp.int32),
                               jnp.asarray(mask, jnp.float32), scorer.cfg, 2))
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1, :7], want[1, :7], rtol=2e-4, atol=2e-4)


def test_scorer_matches_naive_oracle_end_to_end():
    hf, scorer = make_scorer(seed=1, layer=2)
    tok = scorer.tokenizer
    sents = ["The lungs are clear.",
             "No pleural effusion seen.",
             "Heart size is normal.",
             "The cardiac silhouette is stable.",
             "There is no acute process."]
    pairs = [(a, b) for i, a in enumerate(sents) for b in sents[i + 1:]]
    got = scorer(pairs)

    # oracle: HF torch embeddings + per-pair loops, same tokenization
    def embed_one(s):
        q = tok.encode(s, max_len=48)
        ids = np.asarray([q], np.int64)
        mask = np.ones_like(ids)
        h = hf_hidden(hf, ids, mask, layer=2)[0]
        w = np.asarray([0.0 if t in (tok.cls_id, tok.sep_id) else 1.0
                        for t in q])
        return h, w

    cache = {s: embed_one(s) for s in sents}
    for (a, b), f1 in zip(pairs, got):
        ea, wa = cache[a]
        eb, wb = cache[b]
        want = naive_pair_f1(ea, wa, eb, wb)
        assert abs(f1 - want) < 2e-4, (a, b, f1, want)


def test_identical_tokenization_scores_one_and_dedups():
    _, scorer = make_scorer(seed=2, layer=2)
    # distinct strings, identical after lowercase+punct-split tokenization
    long = "The lungs are clear ."
    short = "the lungs are clear."
    assert scorer.tokenizer.encode(long) == scorer.tokenizer.encode(short)
    (f1,) = scorer([(long, short)])
    assert f1 > 0.999

    kept = remove_duplicate_sentences(
        [long, "No pleural effusion seen.", short], similarity_fn=scorer)
    # the SHORTER of the near-duplicate pair is removed (reference
    # generate_reports_for_images.py:80-96)
    assert short not in kept and long in kept
    assert "No pleural effusion seen." in kept

    # report-level: capitalized variants so the sentence splitter keeps
    # them distinct; still tokenize-identical -> soft dedup removes one
    long_c, short_c = "The lungs are clear .", "The lungs are clear."
    regions = [long_c, "No pleural effusion seen.", short_c]
    with_soft = assemble_report(regions, similarity_fn=scorer)
    without = assemble_report(regions)
    assert short_c in without
    assert with_soft == "The lungs are clear . No pleural effusion seen."


def test_pair_f1_handles_empty_weight():
    _, scorer = make_scorer(seed=3, layer=1)
    # "." tokenizes to [CLS] . [SEP]; "," likewise — both still carry one
    # scored token; a truly empty weight row must yield 0, not NaN
    emb, weight = scorer.embed([".", ""])
    f1 = np.asarray(bs._pair_f1(emb, weight * 0.0, jnp.asarray([0]),
                                jnp.asarray([1])))
    assert np.isfinite(f1).all() and f1[0] == 0.0


def test_load_from_local_dir(tmp_path):
    """load_bertscorer round-trips a saved HF model dir (bin + vocab)."""
    hf = small_hf(seed=4)
    d = tmp_path / "distilbert"
    d.mkdir()
    torch.save(hf.state_dict(), str(d / "pytorch_model.bin"))
    with open(d / "vocab.txt", "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    scorer = bs.load_bertscorer(str(d), cfg=small_cfg(), layer=2)
    (f1,) = scorer([("the lungs are clear .", "no pleural effusion seen .")])
    assert np.isfinite(f1)


def test_default_scorer_env(tmp_path, monkeypatch):
    monkeypatch.delenv("RGRG_DISTILBERT_DIR", raising=False)
    assert bs.default_scorer(_cache=False) is None

    hf = small_hf(seed=5)
    d = tmp_path / "db"
    d.mkdir()
    torch.save(hf.state_dict(), str(d / "pytorch_model.bin"))
    with open(d / "vocab.txt", "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    monkeypatch.setenv("RGRG_DISTILBERT_DIR", str(d))
    scorer = bs.default_scorer(cfg=small_cfg(), layer=2, _cache=False)
    assert scorer is not None
