"""Beam search as a jittable lax.while_loop state machine.

Replaces the reference's CPU-side HF BeamSearchScorer loop
(language_model.py:529-607) with a device-resident implementation that
reproduces the HF (transformers 4.19) semantics exactly:

  - per step: top 2*K of the K*V joint scores; EOS candidates ranked < K go
    to the finished pool (score length-penalized by the CURRENT length,
    i.e. the hypothesis excluding EOS); the first K non-EOS candidates (in
    score order) continue as the alive beams;
  - a batch is done when its finished pool holds K hypotheses and (with
    early_stopping=False) the best attainable alive score
    max(next_scores)/cur_len^lp cannot beat the worst finished score;
  - finalize adds all alive beams of unfinished batches, picks the best
    finished hypothesis, and appends EOS if it fits (HF finalize).

The finished pool is a fixed [B, K] top-k set (HF's add-with-eviction keeps
exactly the top K by score, so a top-k merge is equivalent). The KV cache is
NEVER reordered: beam reordering updates a tiny [B, K, T] ancestry table and
attention reads the right rows through it (gpt2.decode_step_beam) — the HF
_reorder_cache equivalent without the per-step full-cache gather that broke
while_loop carry donation (~7 ms/step of copies at 256 rows on v5e).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from rgrg_tpu.core.config import DecoderConfig
from rgrg_tpu.models import gpt2

NEG_INF = -1.0e9


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_length", "num_beams", "length_penalty", "early_stopping",
    "precision", "no_image", "batch", "cache_dtype", "return_done",
    "pack_kv_pairs", "pallas_attn"))
def beam_generate(params: Dict[str, Any], image_features: Optional[jnp.ndarray],
                  cfg: DecoderConfig, max_length: int = 300,
                  num_beams: int = 4, length_penalty: float = 1.0,
                  early_stopping: bool = False, precision=None,
                  active: Optional[jnp.ndarray] = None,
                  no_image: bool = False,
                  batch: Optional[int] = None,
                  cache_dtype=None, return_done: bool = False,
                  pack_kv_pairs: bool = True,
                  pallas_attn: bool = False) -> jnp.ndarray:
    """image_features: [B, F] (or None with `batch` for vanilla GPT-2).

    Returns output ids [B, max_length] of the best hypothesis per item
    (padded; EOS appended when it fits), matching reference
    language_model.generate with num_beams>1.

    return_done: also return the [B] bool `done` mask at loop exit. A done
    item's search CLOSED before the cap (BeamHypotheses.is_done — a
    condition on cur_len only, never max_length), so its finalized output
    is identical under any longer cap: done rows stop adding to the
    finished pool and contribute no alive beams, hence finalize reads the
    same pool either way. The length-bucket cascade uses this to re-decode
    only not-done rows at the next rung.

    pack_kv_pairs (default ON): store the KV cache with adjacent head
    pairs merged into the lane dim ([H/2, BK, T, 2D] — pad-free in TPU
    tiled layout vs the 2x lane pad of trailing D=64; see
    gpt2.cache_to_beam_layers). Output is identical token-for-token
    (test_beam.py); int8 / odd-head caches fall back to the standard
    layout automatically. Measured 1.60x beam-4 decode at B=32 on v5e
    and unlocks B=64 (unpacked OOMs at compile) —
    docs/artifacts/beam_packed_ab.json.

    pallas_attn: fuse each layer's ancestry-masked attention into the
    Pallas flash-decoding kernel (ops/beam_attn_pallas.py) instead of the
    XLA one-hot contraction. Packed bf16 caches only; falls back to the
    XLA path when the layout or item count does not qualify. Outputs are
    numerically equal modulo f32-accumulation order
    (tests/test_beam.py::test_pallas_attn_matches_xla).
    """
    k = num_beams
    if image_features is not None:
        b = image_features.shape[0]
        feats = jnp.repeat(image_features, k, axis=0)       # [B*K, F]
    else:
        b = batch
        feats = None
    v = cfg.vocab_size
    eos, pad = cfg.eos_token_id, cfg.pad_token_id

    logits0, cache = gpt2.prefill(params, feats, cfg.bos_token_id,
                                  max_length, cfg, precision,
                                  cache_dtype=cache_dtype,
                                  batch=None if feats is not None else b * k)

    # state
    out = jnp.full((b, k, max_length), pad, jnp.int32).at[:, :, 0].set(cfg.bos_token_id)
    beam_scores = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (k - 1), jnp.float32), (b, 1))
    f_scores = jnp.full((b, k), -jnp.inf, jnp.float32)
    f_seqs = jnp.full((b, k, max_length), pad, jnp.int32)
    f_lens = jnp.zeros((b, k), jnp.int32)
    done = jnp.zeros((b,), bool)
    if active is not None:
        done = done | ~active

    def process(logits, state, cur_len):
        """One HF BeamSearchScorer.process step. cur_len = current sequence
        length (tokens so far, incl. BOS); the new token lands at index
        cur_len. Returns (new_beam [B, K] per-item parent-lane indices —
        consumed by reorder_ancestry, NOT flat cache-row indices —, next
        tokens [B*K], new state)."""
        (out, beam_scores, f_scores, f_seqs, f_lens, done) = state
        # two-stage exact top-2K: per-lane top-2K of the RAW logits (per
        # lane, logp = logits - logsumexp is a monotone shift, so the same
        # 2K tokens win), then merge the K*2K candidates. Equivalent to
        # lax.top_k over the [B, K*V] joint scores — including tie order:
        # stage-2 candidates are (lane, rank)-ordered and within-lane ties
        # rank in token order, so ties break lane-major then token id, the
        # flat layout's order — but avoids materializing the f32 [B*K, V]
        # log-softmax and two [B, K*V] relayout copies that fed the
        # full-width top_k (measured ~1.7 ms/step at 192 rows, 60% of it
        # the top_k itself at V-width).
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
        lane_vals, lane_idx = jax.lax.top_k(logits, 2 * k)     # [B*K, 2K]
        cand = (lane_vals.astype(jnp.float32) - lse[:, None]
                + beam_scores.reshape(-1)[:, None])            # logp + score
        next_scores, mi = jax.lax.top_k(cand.reshape(b, k * 2 * k), 2 * k)
        next_beam = mi // (2 * k)                              # [B, 2K]
        next_tok = jnp.take_along_axis(lane_idx.reshape(b, k * 2 * k),
                                       mi, axis=1)

        # ---- finished-pool update (EOS candidates with rank < K) ----
        rank = jnp.arange(2 * k)[None, :]
        is_eos = next_tok == eos
        addable = is_eos & (rank < k) & ~done[:, None]
        lp = jnp.asarray(cur_len, jnp.float32) ** length_penalty
        cand_scores = jnp.where(addable, next_scores / lp, -jnp.inf)  # [B, 2K]
        cand_seqs = jnp.take_along_axis(
            out, next_beam[..., None], axis=1)                 # [B, 2K, L]

        merged_scores = jnp.concatenate([f_scores, cand_scores], axis=1)
        merged_seqs = jnp.concatenate([f_seqs, cand_seqs], axis=1)
        merged_lens = jnp.concatenate(
            [f_lens, jnp.full((b, 2 * k), cur_len, jnp.int32)], axis=1)
        top_scores, top_i = jax.lax.top_k(merged_scores, k)
        f_scores = top_scores
        f_seqs = jnp.take_along_axis(merged_seqs, top_i[..., None], axis=1)
        f_lens = jnp.take_along_axis(merged_lens, top_i, axis=1)

        # ---- alive beams: first K non-EOS candidates in order ----
        sel = jnp.argsort(jnp.where(is_eos, 1, 0), axis=1, stable=True)[:, :k]
        new_scores = jnp.take_along_axis(next_scores, sel, axis=1)
        new_tok = jnp.take_along_axis(next_tok, sel, axis=1)
        new_beam = jnp.take_along_axis(next_beam, sel, axis=1)

        # done batches: pad token, beam 0, score 0 (HF convention)
        new_scores = jnp.where(done[:, None], 0.0, new_scores)
        new_tok = jnp.where(done[:, None], pad, new_tok)
        new_beam = jnp.where(done[:, None], 0, new_beam)

        out = jnp.take_along_axis(out, new_beam[..., None], axis=1)
        out = out.at[:, :, cur_len].set(new_tok)

        # ---- done condition (BeamHypotheses.is_done) ----
        count = jnp.sum(jnp.isfinite(f_scores), axis=1)
        if early_stopping:
            newly_done = count >= k
        else:
            best_possible = next_scores[:, 0] / lp
            worst_finished = jnp.min(
                jnp.where(jnp.isfinite(f_scores), f_scores, jnp.inf), axis=1)
            newly_done = (count >= k) & (worst_finished >= best_possible)
        done = done | newly_done

        state = (out, new_scores, f_scores, f_seqs, f_lens, done)
        return new_beam, new_tok.reshape(-1), state

    def reorder_ancestry(anc, new_beam, next_slot):
        """HF _reorder_cache equivalent on the ancestry table: continuing
        beam k' inherits parent new_beam[b,k']'s history; the slot about to
        be written belongs to lane k' itself."""
        anc = jnp.take_along_axis(anc, new_beam[:, :, None], axis=1)
        return anc.at[:, :, next_slot].set(jnp.arange(k)[None, :])

    # one-time relayout to the head-leading beam layout [L, H, B*K, T, D]:
    # inside the loop every cross-lane attention dot then batches over
    # (h, b) with operands already batch-leading — no per-step cache
    # transpose, and per-layer buffers keep reads/writes copy-free
    # (gpt2.cache_to_beam_layers)
    t_total = cache["k"].shape[3]
    cache = gpt2.cache_to_beam_layers(cache, pack_pairs=pack_kv_pairs)

    # first token from prefill logits (cur_len = 1: just BOS). All K lanes
    # of an item share identical prefill KV (feats repeated), so identity
    # ancestry is correct for slots 0..1 regardless of the first reorder.
    anc = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :, None],
                           (b, k, t_total))
    state = (out, beam_scores, f_scores, f_seqs, f_lens, done)
    new_beam, tok, state = process(logits0, state, 1)
    anc = reorder_ancestry(anc, new_beam, 2)

    def cond(carry):
        t, _, state, _, _ = carry
        done = state[5]
        # reference loop breaks when cur_len >= max_length; cur_len = t+2
        return (t + 2 < max_length) & ~jnp.all(done)

    def body(carry):
        t, tok, state, cache, anc = carry
        logits, cache = gpt2.decode_step_beam(params, tok, t, cache, anc,
                                              cfg, precision,
                                              no_image=no_image,
                                              pallas_attn=pallas_attn)
        new_beam, tok, state = process(logits, state, t + 2)
        anc = reorder_ancestry(anc, new_beam, t + 3)
        return t + 1, tok, state, cache, anc

    t, _, state, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tok, state, cache, anc))
    out, beam_scores, f_scores, f_seqs, f_lens, done = state

    # ---- finalize: unfinished batches contribute their alive beams ----
    final_len = t + 2  # sequence length at loop exit
    lp = final_len.astype(jnp.float32) ** length_penalty
    alive_scores = jnp.where(done[:, None], -jnp.inf, beam_scores / lp)
    merged_scores = jnp.concatenate([f_scores, alive_scores], axis=1)
    merged_seqs = jnp.concatenate([f_seqs, out], axis=1)
    merged_lens = jnp.concatenate(
        [f_lens, jnp.full((b, k), final_len, jnp.int32)], axis=1)

    best = jnp.argmax(merged_scores, axis=1)
    best_seq = jnp.take_along_axis(merged_seqs, best[:, None, None], axis=1)[:, 0]
    best_len = jnp.take_along_axis(merged_lens, best[:, None], axis=1)[:, 0]

    # HF finalize appends EOS after the hypothesis when it fits
    pos = jnp.arange(max_length)[None, :]
    best_seq = jnp.where(pos == best_len[:, None], eos, best_seq)
    best_seq = jnp.where(pos > best_len[:, None], pad, best_seq)
    if active is not None:
        best_seq = jnp.where(active[:, None], best_seq, pad)
    if return_done:
        return best_seq, done
    return best_seq
