"""Greedy decoding as a jittable lax.while_loop state machine.

Replaces the reference's Python token loop (language_model.py:609-652) with
a static-shape device-side loop: the KV cache is a fixed buffer, the output
id matrix is fixed [B, max_length], and finished sequences keep appending
pad tokens exactly like the reference (pad == eos == 50256, skipped when
decoding). Early-exits when every sequence has finished.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from rgrg_tpu.core.config import DecoderConfig
from rgrg_tpu.models import gpt2


@functools.partial(jax.jit, static_argnames=("cfg", "max_length", "precision",
                                              "cache_dtype", "pack_kv_pairs"))
def greedy_generate(params: Dict[str, Any], image_features: jnp.ndarray,
                    cfg: DecoderConfig, max_length: int = 300,
                    precision=None, active: jnp.ndarray | None = None,
                    cache_dtype=None, pack_kv_pairs: bool = False) -> jnp.ndarray:
    """image_features: [B, 1024] raw region features.

    active: optional [B] bool — rows that actually need decoding (padding
    rows of a compacted selection batch are born finished, so they cost no
    loop iterations once real rows are done).

    pack_kv_pairs (default OFF): head-pair-packed KV cache ([L,B,H/2,T,2D],
    pad-free lanes for D=64 — see gpt2.init_cache); outputs identical for
    f32/bf16 (tests/test_gpt2.py::test_greedy_packed_kv_identical).
    MEASURED SLOWER for greedy on v5e and left off — unlike beam (1.60x
    win: 4-row ancestry dots, cache-staging-bound), greedy's one-row
    attention fuses well unpacked; the packed step's zero-interleaved
    queries + context extraction cost more than the 2x lane pad saves
    (bf16 packed 107 vs int8 unpacked 181 r/s at B=32; int8 packed 74
    even with trailing-1 per-pair scales —
    docs/artifacts/greedy_packed_ab.json, both formulations).

    Returns output_ids [B, max_length]: column 0 is BOS, then generated
    tokens; pad tokens after a sequence finishes (reference semantics:
    max_length counts the BOS, so at most max_length-1 tokens are generated).
    """
    b = image_features.shape[0]
    # cache slots: 0=image, 1..max_length = BOS + up to max_length-1 tokens
    logits0, cache = gpt2.prefill(params, image_features, cfg.bos_token_id,
                                  max_length, cfg, precision,
                                  cache_dtype=cache_dtype,
                                  pack_pairs=pack_kv_pairs)

    out = jnp.full((b, max_length), cfg.pad_token_id, jnp.int32)
    out = out.at[:, 0].set(cfg.bos_token_id)

    first = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    if active is not None:
        first = jnp.where(active, first, cfg.pad_token_id)
    out = out.at[:, 1].set(first)
    unfinished = first != cfg.eos_token_id
    if active is not None:
        unfinished = unfinished & active

    def cond(state):
        t, _, unfin, _, _ = state
        return (t < max_length - 2) & jnp.any(unfin)

    def body(state):
        t, token, unfin, out, cache = state
        logits, cache = gpt2.decode_step(params, token, t, cache, cfg, precision)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(unfin, nxt, cfg.pad_token_id)
        out = out.at[:, t + 2].set(nxt)
        unfin = unfin & (nxt != cfg.eos_token_id)
        return t + 1, nxt, unfin, out, cache

    _, _, _, out, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), first, unfinished, out, cache))
    return out
