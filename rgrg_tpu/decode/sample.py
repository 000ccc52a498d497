"""Multinomial sampling decode (temperature / top-k / top-p).

The reference declares sampling modes but raises NotImplementedError
(language_model.py:448-479); here they are first-class: a jittable
lax.while_loop like the greedy decoder, with per-step categorical sampling
after temperature scaling and nucleus/top-k filtering.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from rgrg_tpu.core.config import DecoderConfig
from rgrg_tpu.models import gpt2


def _filter_logits(logits: jnp.ndarray, top_k: int, top_p: float) -> jnp.ndarray:
    """HF-style filtering: keep top_k (0 = off) then nucleus top_p (1 = off);
    filtered entries -> -inf."""
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        cutoff_mask = cum - probs > top_p
        cutoff = jnp.where(cutoff_mask, -jnp.inf, sorted_logits)
        threshold = jnp.min(jnp.where(jnp.isfinite(cutoff), cutoff, jnp.inf),
                            axis=-1, keepdims=True)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return logits


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_length", "temperature", "top_k", "top_p", "precision"))
def sample_generate(params: Dict[str, Any], image_features: jnp.ndarray,
                    rng: jax.Array, cfg: DecoderConfig, max_length: int = 300,
                    temperature: float = 1.0, top_k: int = 0,
                    top_p: float = 1.0, precision=None,
                    active: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """image_features: [B, F]. Returns ids [B, max_length] (BOS first)."""
    b = image_features.shape[0]
    logits0, cache = gpt2.prefill(params, image_features, cfg.bos_token_id,
                                  max_length, cfg, precision)

    def pick(logits, key):
        logits = logits.astype(jnp.float32) / temperature
        logits = _filter_logits(logits, top_k, top_p)
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)

    out = jnp.full((b, max_length), cfg.pad_token_id, jnp.int32)
    out = out.at[:, 0].set(cfg.bos_token_id)

    rng, key = jax.random.split(rng)
    first = pick(logits0, key)
    if active is not None:
        first = jnp.where(active, first, cfg.pad_token_id)
    out = out.at[:, 1].set(first)
    unfinished = first != cfg.eos_token_id
    if active is not None:
        unfinished = unfinished & active

    def cond(state):
        t, _, unfin, _, _, _ = state
        return (t < max_length - 2) & jnp.any(unfin)

    def body(state):
        t, token, unfin, out, cache, rng = state
        logits, cache = gpt2.decode_step(params, token, t, cache, cfg, precision)
        rng, key = jax.random.split(rng)
        nxt = pick(logits, key)
        nxt = jnp.where(unfin, nxt, cfg.pad_token_id)
        out = out.at[:, t + 2].set(nxt)
        unfin = unfin & (nxt != cfg.eos_token_id)
        return t + 1, nxt, unfin, out, cache, rng

    _, _, _, out, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), first, unfinished, out, cache, rng))
    return out
