"""Pallas TPU kernel for the beam-decode ancestry-masked attention step.

MEASURED NEGATIVE — kept as an opt-in (`pallas_attn` on beam_generate /
decode_step_beam), the XLA one-hot path stays the default. On v5e at the
serving shape (B=32, 192 rows, K=4, T=61, bf16 packed cache) the kernel
reaches 0.925x of the XLA path at its best block size and never wins:
item_block 4/8/16 = 0.87/0.93/0.88x; native-dtype dots (vs f32-cast
operands) recovered only ~1%; swapping the grid to (item-block,
head-pair) so the selection mask stays VMEM-resident across head-pairs +
an int8 mask changed nothing (docs/artifacts/beam_pallas_attn_ab.json).
Conclusion matches the roofline (STATUS.md): beam decode is
occupancy/latency-bound on small dots, not bandwidth-bound — streaming
the cache through VMEM "exactly once" saves bytes the XLA path wasn't
actually paying for, while adding per-program overheads and cross-item
waste (each row scores against its whole item-block). Attention is also
only part of the 18.6 ms step (projections/MLP/logits/beam bookkeeping),
bounding any attention-only win.

One decode step of beam search reads the ENTIRE per-layer KV cache (every
beam lane, every slot) to compute 4-row attention per item. The XLA
one-hot path (gpt2.decode_step_beam) materializes dot operands per layer;
this kernel streams each item-block's K/V slice through VMEM exactly once
and fuses scores, ancestry masking, softmax and the context contraction —
flash-decoding shaped, for the head-pair-packed cache layout
(gpt2.cache_to_beam_layers pack_pairs).

Replaces HF's _reorder_cache-equivalent semantics exactly like the XLA
path (reference language_model.py:529-607 via GenerationMixin): the cache
is never reordered; each query row r=(item, beam k, sub-head p) attends
over its item's K*T lane-slots through the ancestry table.

Mosaic survival notes (three earlier formulations of a beam kernel died —
see decode_step_beam's docstring): grid over (head-pair, item-block) so
the kernel body has NO head loop (the fori_loop VMEM-accounting trap) and
NO batched dot_general (remote-compiler crash); every tensor is 2-D/3-D;
BOTH dots are plain single-contracting-dim 2-D matmuls over the flattened
(lane, slot) axis — on-TPU runs of this kernel found tpu.matmul rejects
multi-contracting-dim dot_generals ("lhs contracting dims must be of size
1") — so the softmax runs directly over the masked flattened axis
(exactly one selected lane per (row, slot) makes that equal to the
per-slot softmax); and the selection mask arrives PRE-FLATTENED from XLA
(layer-invariant, one build per step) because in-kernel reshapes that
alter the trailing lane dim ([R2b, Jb, T] -> [R2b, Jb*T]) hit Mosaic's
"infer-vector-layout: unsupported shape cast" while lane-preserving ones
([Jb, T, 2D] -> [Jb*T, 2D]) compile.

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
                 # with the f32 [2*IB*K, IB*K*T] score intermediate.
                 # Overridable per call (item_block=) for block-size sweeps;
                 # larger blocks cut grid overhead but waste MXU flops and
                 # softmax lanes quadratically/linearly on cross-item pairs.


def _beam_attn_kernel(qz_ref, k_ref, v_ref, m_ref, out_ref):
    qz = qz_ref[0, :, :]                                 # [R2b, 2D]
    kb = k_ref[0, :, :, :]                               # [Jb, T, 2D]
    vb = v_ref[0, :, :, :]
    m = m_ref[:, :]                                      # [R2b, Jb*T] int8
    jb, t, dd = kb.shape

    # Both dots as plain single-contracting-dim 2-D matmuls over the
    # flattened (lane, slot) axis — tpu.matmul rejects multi-contracting
    # dot_generals ("lhs contracting dims must be of size 1"). The
    # [Jb, T, 2D] -> [Jb*T, 2D] reshape keeps the trailing lane dim intact
    # (Mosaic supports it); reshapes that ALTER the lane dim (e.g.
    # [R2b, Jb, T] -> [R2b, Jb*T]) hit "unsupported shape cast", which is
    # why the selection mask arrives pre-flattened from XLA instead of
    # being built from iota compares in here.
    kf = kb.reshape(jb * t, dd)
    vf = vb.reshape(jb * t, dd)

    # scores[r, j*T+t] = qz[r] . k[j, t]  (cross-head lane products hit
    # the structural zeros of qz; cross-item pairs are masked below).
    # Dots run in the CACHE dtype with f32 accumulation — casting the
    # operands to f32 first (the first on-TPU formulation) forced
    # multi-pass f32 MXU matmuls AND a full f32 VMEM copy of every cache
    # byte, and measured 0.86x of the XLA path; native bf16 inputs are
    # what the XLA one-hot path feeds its einsums too.
    scores = jax.lax.dot_general(
        qz, kf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [R2b, Jb*T] f32

    # each (r, slot) has EXACTLY ONE selected lane, so a softmax over the
    # masked flattened axis equals the per-slot softmax of the XLA path
    w = jnp.where(m != 0, scores, -1e9)
    w = w - jnp.max(w, axis=-1, keepdims=True)
    w = jnp.exp(w)
    w = w / jnp.sum(w, axis=-1, keepdims=True)           # [R2b, Jb*T]

    ctx = jax.lax.dot_general(
        w.astype(vf.dtype), vf,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [R2b, 2D]
    out_ref[0, :, :] = ctx


def beam_attention_pallas(qz: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          anc_q: jnp.ndarray, *, k_beams: int,
                          item_block: int | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """See module docstring. Requires items % item_block == 0 (decode row
    budgets are multiples of ITEM_BLOCK; callers fall back to the XLA path
    otherwise)."""
    return _beam_attention_pallas(
        qz, k, v, anc_q, k_beams=k_beams,
        item_block=ITEM_BLOCK if item_block is None else item_block,
        interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("k_beams", "item_block", "interpret"))
def _beam_attention_pallas(qz, k, v, anc_q, *, k_beams, item_block,
                           interpret):
    h2, r2, dd = qz.shape
    bk, t = k.shape[1], k.shape[2]
    ib = item_block
    jb = ib * k_beams
    assert bk % jb == 0 and r2 == 2 * bk, (qz.shape, k.shape)
    nblocks = bk // jb

    # Pre-flattened BLOCK-LOCAL selection mask [R2, Jb*T] in XLA (built
    # once per step, shared by all layers' kernel calls through jit CSE):
    # row r selects flat column j_loc*T + t iff lane i*jb + j_loc is r's
    # item's ancestor anc_q[r, t] — anc_q == -1 (invisible) never equals a
    # beam id, so visibility is folded in. Each grid row i reads only its
    # own diagonal block, so storing just the local [R2, Jb*T] strip saves
    # the other nblocks-1 strips of zeros.
    r_loc = jnp.arange(r2, dtype=jnp.int32) % (2 * jb)
    j_loc = jnp.arange(jb, dtype=jnp.int32)
    same_item = (r_loc[:, None] // (2 * k_beams)) == (j_loc[None, :] // k_beams)
    sel = same_item[:, :, None] & (anc_q[:, None, :] == (j_loc % k_beams)[None, :, None])
    mask = sel.reshape(r2, jb * t).astype(jnp.int8)

    # grid order (item-block, head-pair): the mask block's index map is
    # independent of h, so Pallas keeps it resident in VMEM across the h2
    # inner iterations instead of re-fetching it per head-pair (the
    # head-pair-outer order re-read the mask h2 times per step — ~1 GB of
    # extra HBM traffic at the serving shape).
    return pl.pallas_call(
        _beam_attn_kernel,
        grid=(nblocks, h2),
        in_specs=[
            pl.BlockSpec((1, 2 * jb, dd), lambda i, h: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jb, t, dd), lambda i, h: (h, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jb, t, dd), lambda i, h: (h, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * jb, jb * t), lambda i, h: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * jb, dd), lambda i, h: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h2, r2, dd), jnp.float32),
        interpret=interpret,
    )(qz, k, v, mask)
