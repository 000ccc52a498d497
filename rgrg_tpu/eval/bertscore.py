"""BERTScore soft-dedup scorer (distilbert-base-uncased), TPU-native.

The reference removes near-duplicate generated sentences via HF evaluate's
bert_score: pairwise BERTScore-F1 with model_type="distilbert-base-uncased"
and threshold 0.9, removing the SHORTER sentence of a similar pair
(generate_reports_for_images.py:60-96, evaluate_language_model.py:1048-1057,
BERTSCORE_SIMILARITY_THRESHOLD = 0.9).

BERTScore semantics matched here (bert_score package, idf off, no baseline
rescaling — the evaluate wrapper's defaults):
  * embeddings = hidden states after layer 5 of distilbert-base-uncased
    (bert_score's model2layers default for that model),
  * L2-normalized token embeddings, greedy cosine matching:
    P = mean over candidate tokens of the best match in the reference,
    R = mean over reference tokens of the best match in the candidate,
    F1 = 2PR/(P+R) (0 where P+R == 0),
  * [CLS]/[SEP] carry weight 0 (bert_score sets their idf to 0 even with
    idf=False); padding is excluded.

The reference invokes the scorer once per sentence pair — O(n^2) full model
calls per report. Here all unique sentences of a batch of pairs are embedded
in ONE encoder call and every pair's F1 comes out of one jitted contraction.

The encoder reuses eval.chexbert.bert_encode: distilbert is a 6-layer BERT
without token-type embeddings, so conversion supplies a zero token-type row.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rgrg_tpu.eval.chexbert import BertConfig, bert_encode
from rgrg_tpu.text.wordpiece import WordPieceTokenizer

DISTILBERT_CONFIG = BertConfig(layers=6)
# bert_score embeds with the hidden states AFTER this many transformer
# layers (its per-model default table: distilbert-base-uncased -> 5)
BERTSCORE_LAYER = 5
BERTSCORE_SIMILARITY_THRESHOLD = 0.9


def convert_distilbert(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """HF DistilBertModel state_dict -> bert_encode params layout.

    distilbert has no token-type embeddings; a zero row keeps the shared
    encoder unchanged (it adds token_type[0] everywhere)."""
    sd = {k[len("distilbert."):] if k.startswith("distilbert.") else k: np.asarray(v)
          for k, v in sd.items()}

    def lin(key):
        return {"kernel": np.transpose(sd[f"{key}.weight"], (1, 0)),
                "bias": sd[f"{key}.bias"]}

    def ln(key):
        return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}

    word = sd["embeddings.word_embeddings.weight"]
    params: Dict[str, Any] = {
        "word_embeddings": {"embedding": word},
        "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {"embedding": np.zeros((1, word.shape[1]), word.dtype)},
        "emb_ln": ln("embeddings.LayerNorm"),
    }
    i = 0
    while f"transformer.layer.{i}.attention.q_lin.weight" in sd:
        p = f"transformer.layer.{i}"
        params[f"layer_{i}"] = {
            "q": lin(f"{p}.attention.q_lin"),
            "k": lin(f"{p}.attention.k_lin"),
            "v": lin(f"{p}.attention.v_lin"),
            "attn_out": lin(f"{p}.attention.out_lin"),
            "attn_ln": ln(f"{p}.sa_layer_norm"),
            "intermediate": lin(f"{p}.ffn.lin1"),
            "output": lin(f"{p}.ffn.lin2"),
            "out_ln": ln(f"{p}.output_layer_norm"),
        }
        i += 1
    return params


def _bucket(n: int, floor: int = 16, cap: int | None = None) -> int:
    b = floor
    while b < n:
        b *= 2
    return min(b, cap) if cap else b


@functools.partial(jax.jit, static_argnames=("cfg", "layer"))
def _embed(params, ids, mask, cfg: BertConfig, layer: int):
    import dataclasses
    hidden = bert_encode(params, ids, mask, dataclasses.replace(cfg, layers=layer),
                         precision=jax.lax.Precision.HIGHEST)
    norm = jnp.linalg.norm(hidden, axis=-1, keepdims=True)
    return hidden / jnp.maximum(norm, 1e-12)


@jax.jit
def _pair_f1(emb, weight, ia, ib):
    """emb [N,S,H] L2-normalized, weight [N,S] (1 = scored token),
    ia/ib [P] sentence indices -> F1 [P]."""
    a, b = emb[ia], emb[ib]            # [P,S,H]
    wa, wb = weight[ia], weight[ib]    # [P,S]
    sim = jnp.einsum("psh,pth->pst", a, b,
                     precision=jax.lax.Precision.HIGHEST)
    best_ab = jnp.where(wb[:, None, :] > 0, sim, -1e9).max(axis=2)  # [P,S]
    best_ba = jnp.where(wa[:, :, None] > 0, sim, -1e9).max(axis=1)  # [P,S]
    p = (best_ab * wa).sum(-1) / jnp.maximum(wa.sum(-1), 1e-9)
    r = (best_ba * wb).sum(-1) / jnp.maximum(wb.sum(-1), 1e-9)
    return jnp.where(p + r > 0, 2 * p * r / jnp.maximum(p + r, 1e-12), 0.0)


class BERTScorer:
    """Batched BERTScore-F1 over sentence pairs; plugs into
    text.report.SimilarityFn."""

    def __init__(self, params: Dict[str, Any], tokenizer: WordPieceTokenizer,
                 cfg: BertConfig = DISTILBERT_CONFIG,
                 layer: int = BERTSCORE_LAYER):
        self.params = params
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.layer = layer

    def embed(self, sentences: Sequence[str]):
        """One encoder call for all sentences; returns (emb [N,S,H],
        weight [N,S]) with [CLS]/[SEP]/pad weighted 0. Shapes are bucketed
        (pow-2 N, 16-multiple-ish S) to bound recompiles."""
        tok = self.tokenizer
        seqs = [tok.encode(s, max_len=self.cfg.max_positions) for s in sentences]
        s_pad = _bucket(max(len(q) for q in seqs), floor=16,
                        cap=self.cfg.max_positions)
        n_pad = _bucket(len(seqs), floor=1)
        ids = np.full((n_pad, s_pad), tok.pad_id, np.int32)
        attn = np.zeros((n_pad, s_pad), np.float32)
        weight = np.zeros((n_pad, s_pad), np.float32)
        for i, q in enumerate(seqs):
            q = q[:s_pad]
            ids[i, :len(q)] = q
            attn[i, :len(q)] = 1.0
            w = [0.0 if t in (tok.cls_id, tok.sep_id) else 1.0 for t in q]
            weight[i, :len(q)] = w
        emb = _embed(self.params, jnp.asarray(ids), jnp.asarray(attn),
                     self.cfg, self.layer)
        return emb, jnp.asarray(weight)

    def __call__(self, pairs: List[Tuple[str, str]]) -> List[float]:
        if not pairs:
            return []
        uniq: Dict[str, int] = {}
        for a, b in pairs:
            uniq.setdefault(a, len(uniq))
            uniq.setdefault(b, len(uniq))
        emb, weight = self.embed(list(uniq))
        p_pad = _bucket(len(pairs), floor=1)
        ia = np.zeros(p_pad, np.int32)
        ib = np.zeros(p_pad, np.int32)
        for k, (a, b) in enumerate(pairs):
            ia[k], ib[k] = uniq[a], uniq[b]
        f1 = _pair_f1(emb, weight, jnp.asarray(ia), jnp.asarray(ib))
        return [float(x) for x in np.asarray(f1)[:len(pairs)]]


def load_bertscorer(model_dir: str, cfg: BertConfig = DISTILBERT_CONFIG,
                    layer: int = BERTSCORE_LAYER) -> BERTScorer:
    """Builds the default soft-dedup scorer from a local
    distilbert-base-uncased directory (pytorch_model.bin/model.safetensors +
    vocab.txt). Offline environment: weights must already be on disk."""
    vocab_path = os.path.join(model_dir, "vocab.txt")
    tokenizer = WordPieceTokenizer.from_vocab_file(vocab_path)
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(bin_path):
        import torch
        sd = {k: v.numpy() for k, v in
              torch.load(bin_path, map_location="cpu", weights_only=True).items()}
    elif os.path.exists(st_path):
        from safetensors.numpy import load_file
        sd = load_file(st_path)
    else:
        raise FileNotFoundError(f"no weights in {model_dir}")
    return BERTScorer(convert_distilbert(sd), tokenizer, cfg=cfg, layer=layer)


_DEFAULT_SCORER_CACHE: Dict[str, Any] = {}


def default_scorer(cfg: BertConfig = DISTILBERT_CONFIG,
                   layer: int = BERTSCORE_LAYER,
                   _cache: bool = True) -> BERTScorer | None:
    """The framework-default soft-dedup scorer, or None when no weights are
    available locally.

    Looks at $RGRG_DISTILBERT_DIR (a local distilbert-base-uncased directory).
    The reference hard-depends on downloading distilbert at import
    (generate_reports_for_images.py:62); this environment is offline, so
    absence degrades to exact-dedup-only — callers that pass no explicit
    similarity_fn get soft dedup automatically once weights exist on disk."""
    model_dir = os.environ.get("RGRG_DISTILBERT_DIR", "")
    if not model_dir or not os.path.isdir(model_dir):
        return None
    # cfg is a frozen (hashable) dataclass: include it so a second call with
    # a different BertConfig doesn't silently get the first config's scorer
    key = (model_dir, layer, cfg)
    if _cache and key in _DEFAULT_SCORER_CACHE:
        return _DEFAULT_SCORER_CACHE[key]
    scorer = load_bertscorer(model_dir, cfg=cfg, layer=layer)
    if _cache:
        _DEFAULT_SCORER_CACHE[key] = scorer
    return scorer
