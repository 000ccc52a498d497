"""CheXbert clinical-efficacy labeler, TPU-native.

Re-provides the reference's vendored CheXbert stack (src/CheXbert/): a
bert-base-uncased encoder with 14 linear heads — 13 four-class
(blank/positive/negative/uncertain) + 1 two-class ("No Finding") — pooled on
the CLS token (bert_labeler.py:31-49), plus the Miura / Nicolson label
conversions and micro / example-based CE metrics
(evaluate_language_model.py:199-319).

The encoder is functional JAX (params pytree), weight-compatible with HF
BertModel checkpoints; `convert_chexbert` additionally strips the
nn.DataParallel "module." prefixes the published weights carry.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

CONDITIONS = ["Enlarged Cardiomediastinum", "Cardiomegaly", "Lung Opacity",
              "Lung Lesion", "Edema", "Consolidation", "Pneumonia",
              "Atelectasis", "Pneumothorax", "Pleural Effusion",
              "Pleural Other", "Fracture", "Support Devices", "No Finding"]

FIVE_CONDITIONS = {"Cardiomegaly", "Edema", "Consolidation", "Atelectasis",
                   "Pleural Effusion"}


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 512
    type_vocab: int = 2
    eps: float = 1e-12


def _ln(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(x, p, precision=None):
    return jnp.dot(x, p["kernel"], precision=precision) + p["bias"]


def bert_encode(params: Dict[str, Any], input_ids: jnp.ndarray,
                attention_mask: jnp.ndarray, cfg: BertConfig,
                precision=None) -> jnp.ndarray:
    """input_ids/attention_mask: [B, S] -> last hidden states [B, S, H].
    Standard BERT post-LN encoder with erf-GELU."""
    b, s = input_ids.shape
    emb = (params["word_embeddings"]["embedding"][input_ids]
           + params["position_embeddings"]["embedding"][jnp.arange(s)][None]
           + params["token_type_embeddings"]["embedding"][jnp.zeros((b, s), jnp.int32)])
    x = _ln(emb, params["emb_ln"], cfg.eps)

    bias = (1.0 - attention_mask[:, None, None, :].astype(x.dtype)) * -1e9
    hd = cfg.hidden // cfg.heads

    def heads_split(t):
        return jnp.swapaxes(t.reshape(b, s, cfg.heads, hd), 1, 2)

    for i in range(cfg.layers):
        lp = params[f"layer_{i}"]
        q = heads_split(_dense(x, lp["q"], precision))
        k = heads_split(_dense(x, lp["k"], precision))
        v = heads_split(_dense(x, lp["v"], precision))
        w = jnp.einsum("bhsd,bhtd->bhst", q, k, precision=precision) / np.sqrt(hd)
        w = jax.nn.softmax(w + bias, axis=-1)
        a = jnp.einsum("bhst,bhtd->bhsd", w, v, precision=precision)
        a = jnp.swapaxes(a, 1, 2).reshape(b, s, cfg.hidden)
        x = _ln(x + _dense(a, lp["attn_out"], precision), lp["attn_ln"], cfg.eps)
        h = jax.nn.gelu(_dense(x, lp["intermediate"], precision), approximate=False)
        x = _ln(x + _dense(h, lp["output"], precision), lp["out_ln"], cfg.eps)
    return x


def chexbert_logits(params: Dict[str, Any], input_ids: jnp.ndarray,
                    attention_mask: jnp.ndarray, cfg: BertConfig = BertConfig(),
                    precision=None) -> List[jnp.ndarray]:
    """Returns the 14 head logits: 13x [B, 4] + 1x [B, 2]."""
    hidden = bert_encode(params["bert"], input_ids, attention_mask, cfg, precision)
    cls = hidden[:, 0, :]
    return [_dense(cls, params["heads"][i], precision) for i in range(14)]


def chexbert_label(params, input_ids, attention_mask,
                   cfg: BertConfig = BertConfig()) -> np.ndarray:
    """argmax labels, shape [14, B] (reference label() layout)."""
    logits = chexbert_logits(params, input_ids, attention_mask, cfg)
    return np.stack([np.asarray(jnp.argmax(lg, axis=-1)) for lg in logits])


# ---------------------------------------------------------------------------
# weight conversion
# ---------------------------------------------------------------------------

def convert_chexbert(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """torch CheXbert state_dict -> params. Accepts DataParallel
    ("module."-prefixed) and bare checkpoints; bert under "bert.*", heads
    under "linear_heads.{i}.*"."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    def lin(key):
        return {"kernel": np.transpose(sd[f"{key}.weight"], (1, 0)),
                "bias": sd[f"{key}.bias"]}

    def ln(key):
        return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}

    e = "bert.embeddings"
    bert: Dict[str, Any] = {
        "word_embeddings": {"embedding": sd[f"{e}.word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd[f"{e}.position_embeddings.weight"]},
        "token_type_embeddings": {"embedding": sd[f"{e}.token_type_embeddings.weight"]},
        "emb_ln": ln(f"{e}.LayerNorm"),
    }
    i = 0
    while f"bert.encoder.layer.{i}.attention.self.query.weight" in sd:
        p = f"bert.encoder.layer.{i}"
        bert[f"layer_{i}"] = {
            "q": lin(f"{p}.attention.self.query"),
            "k": lin(f"{p}.attention.self.key"),
            "v": lin(f"{p}.attention.self.value"),
            "attn_out": lin(f"{p}.attention.output.dense"),
            "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": lin(f"{p}.intermediate.dense"),
            "output": lin(f"{p}.output.dense"),
            "out_ln": ln(f"{p}.output.LayerNorm"),
        }
        i += 1

    heads = {j: lin(f"linear_heads.{j}") for j in range(14)}
    return {"bert": bert, "heads": heads}


# ---------------------------------------------------------------------------
# CE metrics (evaluate_language_model.py:199-319)
# ---------------------------------------------------------------------------

def _binary_prf_acc(ref: np.ndarray, gen: np.ndarray) -> Dict[str, float]:
    """sklearn average='binary' semantics with zero-division -> 0."""
    tp = int(np.sum((gen == 1) & (ref == 1)))
    fp = int(np.sum((gen == 1) & (ref == 0)))
    fn = int(np.sum((gen == 0) & (ref == 1)))
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    acc = float(np.mean(gen == ref)) if ref.size else 0.0
    return {"precision": p, "recall": r, "f1": f1, "acc": acc}


def miura_convert(labels: np.ndarray) -> np.ndarray:
    """2 -> 0 (negative class), 3 -> 1 (positive class)."""
    out = labels.copy()
    out[labels == 2] = 0
    out[labels == 3] = 1
    return out


def compute_ce_scores(preds_gen: np.ndarray, preds_ref: np.ndarray) -> Dict[str, Any]:
    """preds_*: [14, num_reports] raw CheXbert labels (0..3).

    Returns micro-averaged (Miura) scores over the 5 conditions and all 14,
    per-condition scores, and example-based (Nicolson) scores.
    """
    gen_m = miura_convert(preds_gen)
    ref_m = miura_convert(preds_ref)

    out: Dict[str, Any] = {"per_condition": {}}
    mask5 = np.array([c in FIVE_CONDITIONS for c in CONDITIONS])

    for ci, cond in enumerate(CONDITIONS):
        out["per_condition"][cond] = _binary_prf_acc(ref_m[ci], gen_m[ci])

    s14 = _binary_prf_acc(ref_m.ravel(), gen_m.ravel())
    s5 = _binary_prf_acc(ref_m[mask5].ravel(), gen_m[mask5].ravel())
    out.update({f"{k}_micro_all": v for k, v in s14.items()})
    out.update({f"{k}_micro_5": v for k, v in s5.items()})

    # example-based, Nicolson convention: only label 1 is positive
    g = preds_gen == 1
    r = preds_ref == 1
    tp = (g & r).sum(axis=0).astype(float)
    fp = (g & ~r).sum(axis=0).astype(float)
    fn = (~g & r).sum(axis=0).astype(float)
    tn = (~g & ~r).sum(axis=0).astype(float)
    with np.errstate(divide="ignore", invalid="ignore"):
        pe = np.nan_to_num(tp / (tp + fp))
        re = np.nan_to_num(tp / (tp + fn))
        fe = np.nan_to_num(2 * tp / (2 * tp + fp + fn))
        ae = np.nan_to_num((tp + tn) / (tp + tn + fp + fn))
    out["precision_example_all"] = float(pe.mean())
    out["recall_example_all"] = float(re.mean())
    out["f1_example_all"] = float(fe.mean())
    out["acc_example_all"] = float(ae.mean())
    return out
