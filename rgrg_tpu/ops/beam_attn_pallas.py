"""Pallas TPU kernel for the beam-decode ancestry-masked attention step.

One decode step of beam search reads the ENTIRE per-layer KV cache (every
beam lane, every slot) to compute 4-row attention per item — the measured
beam plateau is cache HBM->VMEM staging, not FLOPs (STATUS.md roofline:
3%-MXU dots). The XLA one-hot path (gpt2.decode_step_beam) materializes
dot operands per layer; this kernel streams each item-block's K/V slice
through VMEM exactly once and fuses scores, ancestry masking, softmax and
the context contraction — flash-decoding shaped, for the head-pair-packed
cache layout (gpt2.cache_to_beam_layers pack_pairs).

Replaces HF's _reorder_cache-equivalent semantics exactly like the XLA
path (reference language_model.py:529-607 via GenerationMixin): the cache
is never reordered; each query row r=(item, beam k, sub-head p) attends
over its item's K*T lane-slots through the ancestry table.

Mosaic survival notes (three earlier formulations of a beam kernel died —
see decode_step_beam's docstring): grid over (head-pair, item-block) so
the kernel body has NO head loop (the fori_loop VMEM-accounting trap) and
NO batched dot_general (remote-compiler crash); every tensor is 2-D/3-D;
iota is integer broadcasted_iota; the ancestry mask is built from integer
compares (no 4-D one-hot); the context contraction is a multi-free-dim
dot_general double-contraction over adjacent dims (the construct
roi_align_pallas already compiles).

Inputs (per layer):
  qz    [H2, R2, 2D]  bf16/f32 — zero-interleaved pre-scaled queries;
                       row r = (item*K + beam)*2 + p holds head 2*h2+p of
                       that lane in lane-half p, zeros in the other half
                       (so contracting the full 2D lanes is exact).
  k, v  [H2, BK, T, 2D] — packed cache buffers (cache_to_beam_layers).
  anc_q [R2, T] int32 — per query row and slot: the LANE-LOCAL ancestor
                       beam index (0..K-1) whose K/V holds that slot, or
                       -1 where the slot is not visible at this step
                       (future slots; slot 0 under no_image).

Returns ctx [H2, R2, 2D] f32: row r's lane-half p is head 2*h2+p's
context (the other half is the pair head's values under r's weights —
discarded by the caller, same as the XLA packed path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITEM_BLOCK = 4   # items per program: K/V block = 2*IB*K*T*2D bytes; at the
                 # serving shape (K=4, T=61, 2D=128, bf16) that is 500 KB
                 # per buffer — comfortably inside the 16 MB VMEM budget
                 # with f32 [IB*K*2, IB*K, T] score/mask intermediates.


def _beam_attn_kernel(qz_ref, k_ref, v_ref, anc_ref, out_ref, *, k_beams: int):
    qz = qz_ref[0, :, :]                                 # [R2b, 2D]
    kb = k_ref[0, :, :, :]                               # [Jb, T, 2D]
    vb = v_ref[0, :, :, :]
    anc = anc_ref[:, :]                                  # [R2b, T] int32
    r2b, t = anc.shape
    jb = kb.shape[0]

    # scores[r, j, t] = qz[r] . k[j, t]  (cross-head lane products hit the
    # structural zeros of qz; cross-item pairs are masked below)
    scores = jax.lax.dot_general(
        qz.astype(jnp.float32), kb.astype(jnp.float32),
        dimension_numbers=(((1,), (2,)), ((), ())),
        preferred_element_type=jnp.float32)              # [R2b, Jb, T]

    # ancestry + same-item mask from integer compares (block-local ids)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (r2b, jb, t), 0)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (r2b, jb, t), 1)
    same_item = (r_iota // (2 * k_beams)) == (j_iota // k_beams)
    sel = same_item & (anc[:, None, :] == (j_iota % k_beams))
    self_mask = sel.astype(jnp.float32)                  # [R2b, Jb, T]

    # collapse the lane axis: each (r, t) has exactly one selected lane
    w = jnp.sum(scores * self_mask, axis=1)              # [R2b, T]
    w = w + jnp.where(anc >= 0, 0.0, -1e9)
    w = w - jnp.max(w, axis=-1, keepdims=True)
    w = jnp.exp(w)
    w = w / jnp.sum(w, axis=-1, keepdims=True)           # softmax [R2b, T]

    # scatter the weights back onto their lanes and contract with V:
    # ctx[r, d] = sum_{j,t} wsel[r, j, t] * v[j, t, d]
    wsel = w[:, None, :] * self_mask                     # [R2b, Jb, T]
    ctx = jax.lax.dot_general(
        wsel, vb.astype(jnp.float32),
        dimension_numbers=(((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32)              # [R2b, 2D]
    out_ref[0, :, :] = ctx


@functools.partial(jax.jit, static_argnames=("k_beams", "interpret"))
def beam_attention_pallas(qz: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          anc_q: jnp.ndarray, *, k_beams: int,
                          interpret: bool = False) -> jnp.ndarray:
    """See module docstring. Requires rows % (ITEM_BLOCK * k_beams) == 0
    (decode row budgets are multiples of ITEM_BLOCK; callers fall back to
    the XLA path otherwise)."""
    h2, r2, dd = qz.shape
    bk, t = k.shape[1], k.shape[2]
    ib = ITEM_BLOCK
    jb = ib * k_beams
    assert bk % jb == 0 and r2 == 2 * bk, (qz.shape, k.shape)
    nblocks = bk // jb

    return pl.pallas_call(
        functools.partial(_beam_attn_kernel, k_beams=k_beams),
        grid=(h2, nblocks),
        in_specs=[
            pl.BlockSpec((1, 2 * jb, dd), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jb, t, dd), lambda h, i: (h, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jb, t, dd), lambda h, i: (h, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * jb, t), lambda h, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * jb, dd), lambda h, i: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h2, r2, dd), jnp.float32),
        interpret=interpret,
    )(qz, k, v, anc_q)
