"""CheXbert labeler fine-tuning (JAX).

Equivalent of the vendored CheXbert training stack (reference
src/CheXbert/src/run_bert.py, not invoked by the RGRG pipeline but part of
its surface): fine-tune bert-base + the 14 linear heads on labeled report
impressions with per-head cross-entropy (blank/positive/negative/uncertain;
binary for "No Finding"), Adam 2e-5.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rgrg_tpu.eval.chexbert import BertConfig, CONDITIONS, chexbert_logits


def chexbert_loss(params: Dict[str, Any], input_ids: jnp.ndarray,
                  attention_mask: jnp.ndarray, labels: jnp.ndarray,
                  cfg: BertConfig = BertConfig()) -> jnp.ndarray:
    """labels: [14, B] int (0..3; head 13 uses 0/1). Mean CE over heads."""
    logits = chexbert_logits(params, input_ids, attention_mask, cfg)
    total = 0.0
    for i, lg in enumerate(logits):
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[i][:, None], axis=-1)[:, 0]
        total = total + jnp.mean(nll)
    return total / len(logits)


def make_train_step(optimizer, cfg: BertConfig = BertConfig()):
    @jax.jit
    def step(params, opt_state, input_ids, attention_mask, labels):
        loss, grads = jax.value_and_grad(chexbert_loss)(
            params, input_ids, attention_mask, labels, cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_chexbert(params: Dict[str, Any],
                   batches: Iterable[Tuple[np.ndarray, np.ndarray, np.ndarray]],
                   learning_rate: float = 2e-5,
                   cfg: BertConfig = BertConfig()):
    """batches yield (input_ids [B, S], attention_mask [B, S], labels [14, B]).
    Returns (params, losses). Reference defaults: Adam lr 2e-5
    (run_bert.py LEARNING_RATE)."""
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    step = make_train_step(optimizer, cfg)
    losses: List[float] = []
    for ids, mask, labels in batches:
        params, opt_state, loss = step(params, opt_state, jnp.asarray(ids),
                                       jnp.asarray(mask), jnp.asarray(labels))
        losses.append(float(loss))
    return params, losses


def labeler_metrics(preds: np.ndarray, labels: np.ndarray) -> Dict[str, Any]:
    """Per-condition accuracy + the mention/negation/uncertain F1s the
    reference's utils.py reports. preds/labels: [14, N] raw classes."""
    out: Dict[str, Any] = {"per_condition_acc": {}}
    for i, cond in enumerate(CONDITIONS):
        out["per_condition_acc"][cond] = float((preds[i] == labels[i]).mean())

    def f1_of(p, l):
        tp = float(np.sum(p & l))
        fp = float(np.sum(p & ~l))
        fn = float(np.sum(~p & l))
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        return 2 * prec * rec / (prec + rec) if prec + rec else 0.0

    out["mention_f1"] = f1_of(preds != 0, labels != 0)
    out["negation_f1"] = f1_of(preds == 2, labels == 2)
    out["uncertain_f1"] = f1_of(preds == 3, labels == 3)
    out["positive_f1"] = f1_of(preds == 1, labels == 1)
    return out
