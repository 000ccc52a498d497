"""Pallas TPU kernel: beam-search decode attention over an UNREORDERED KV
cache (ancestry-masked cross-lane attention).

Why: beam search must read each live beam's history from the lane that
produced it (HF's _reorder_cache, reference language_model.py:529-607 via
GenerationMixin, physically reorders the cache every step — ~7 ms/step of
HBM copies at 192 rows on v5e). Leaving the cache in place and expressing
the cross-lane read in XLA (gather / one-hot contraction / 3-operand
einsum) measures 12-29 ms/step because the [B,K,H,J,T] score intermediate
or the gathered cache materializes in HBM every layer. This kernel reads
each item-tile's K/V slab into VMEM ONCE and does the entire masked-softmax
attention in-core: per-step HBM traffic is exactly one pass over the cache,
like greedy decode.

Layout: cache rides the head-leading beam layout [H, B*K, T, D]
(gpt2.cache_to_beam_layers per-layer buffers; b-major rows within each head).
Grid: ONE cell per item-tile (few big cells — a fine grid of (tile, head)
cells measured launch/DMA-latency-bound at 22 ms/step); heads run as a
static loop inside the cell, slicing the resident K/V block per head. A
query may attend to ANY lane of its own item, so scores are computed
against all M*T slot-lanes of the tile and an additive bias (built once
per step in XLA from the ancestry table: 0 on the beam's ancestry path
within its own item, -1e9 elsewhere) selects the real history. Softmax
over the full M*T axis then equals softmax over the T ancestry slots.

Mosaic notes (CLAUDE.md): reshapes only merge adjacent dims, no bool
tensors cross the pallas boundary (bias is additive bf16), no in-kernel
iota/gather; the dynamic `slot` never enters the kernel (it is folded into
the bias); q/ctx ride head-major so every block's LAST TWO dims are
aligned or span the array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ITEM_TILE = 8     # items per grid cell: M = ITEM_TILE * K query rows
NEG = -1.0e9


def _attend_head(q, k, v, bias, scale):
    """q [M, D]; k/v [M, T, D] f32; bias [M, M*T] f32 -> ctx [M, D] f32."""
    m, t, d = k.shape
    k2 = k.reshape(m * t, d)                       # adjacent-dim merge
    v2 = v.reshape(m * t, d)
    s = jax.lax.dot_general(q, k2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [M, M*T]
    s = s * scale + bias
    mx = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - mx)
    w = e / jnp.sum(e, axis=1, keepdims=True)
    return jax.lax.dot_general(w, v2, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale):
    # heads as a fori_loop, not a Python unroll: a 16-way unroll produced a
    # Mosaic program big enough to OOM-kill the compile helper
    h = k_ref.shape[0]
    m, t = bias_ref.shape[1], k_ref.shape[2]
    bias = bias_ref[...].reshape(m, m * t).astype(jnp.float32)

    def head(hi, carry):
        q = q_ref[pl.ds(hi, 1)].reshape(
            q_ref.shape[1], q_ref.shape[2]).astype(jnp.float32)
        k = k_ref[pl.ds(hi, 1)].reshape(
            m, t, k_ref.shape[3]).astype(jnp.float32)
        v = v_ref[pl.ds(hi, 1)].reshape(
            m, t, v_ref.shape[3]).astype(jnp.float32)
        ctx = _attend_head(q, k, v, bias, scale).astype(out_ref.dtype)
        out_ref[pl.ds(hi, 1)] = ctx[None]
        return carry

    jax.lax.fori_loop(0, h, head, jnp.zeros((8, 128), jnp.float32))


def _kernel_q(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref, out_ref, *,
              scale):
    h = k_ref.shape[0]
    m, t = bias_ref.shape[1], k_ref.shape[2]
    bias = bias_ref[...].reshape(m, m * t).astype(jnp.float32)

    def head(hi, carry):
        q = q_ref[pl.ds(hi, 1)].reshape(
            q_ref.shape[1], q_ref.shape[2]).astype(jnp.float32)
        k = k_ref[pl.ds(hi, 1)].reshape(
            m, t, k_ref.shape[3]).astype(jnp.float32)
        v = v_ref[pl.ds(hi, 1)].reshape(
            m, t, v_ref.shape[3]).astype(jnp.float32)
        ks = ks_ref[pl.ds(hi, 1)].reshape(m, t, 1)
        vs = vs_ref[pl.ds(hi, 1)].reshape(m, t, 1)
        ctx = _attend_head(q, k * ks, v * vs, bias, scale).astype(out_ref.dtype)
        out_ref[pl.ds(hi, 1)] = ctx[None]
        return carry

    jax.lax.fori_loop(0, h, head, jnp.zeros((8, 128), jnp.float32))


def ancestry_bias(ancestry: jnp.ndarray, slot: jnp.ndarray,
                  no_image: bool = False,
                  item_tile: int = ITEM_TILE) -> jnp.ndarray:
    """Additive attention bias from the beam-ancestry table.

    ancestry: [B, K, T] int32 (lane holding each slot's KV for each beam);
    slot: the cache slot written this step (token slots 0..slot are live).
    Returns [B/TB, TB*K, TB*K*T] bf16: 0 where (same item) & (lane matches
    ancestry) & (slot visible), NEG elsewhere.
    """
    b, k, t = ancestry.shape
    g = b // item_tile
    t_idx = jnp.arange(t)
    visible = t_idx[None, None, None, :] <= slot                  # [1,1,1,T]
    if no_image:
        visible = visible & (t_idx[None, None, None, :] != 0)
    allowed = (ancestry[:, :, None, :]
               == jnp.arange(k)[None, None, :, None]) & visible   # [B,K,L,T]
    allowed = allowed.reshape(g, item_tile, k, k, t)              # [g,i,k,l,t]
    eye = jnp.eye(item_tile, dtype=bool)                          # [i,j]
    full = allowed[:, :, :, None, :, :] & eye[None, :, None, :, None, None]
    bias = jnp.where(full, 0.0, NEG).astype(jnp.bfloat16)
    return bias.reshape(g, item_tile * k, item_tile * k * t)


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   bias: jnp.ndarray,
                   k_scale: jnp.ndarray = None, v_scale: jnp.ndarray = None,
                   interpret: bool = False) -> jnp.ndarray:
    """q [BK, H, D]; k/v in the head-leading beam layout [H, BK, T, D]
    (int8 with scales [H, BK, T, 1], or float); bias from ancestry_bias.
    Returns ctx [BK, H, D] f32.

    BK must be a multiple of the bias's tile size (the decode budget ladder
    keeps B a multiple of 4; ancestry_bias picks the tile)."""
    h, bk, t, d = k.shape
    g = bias.shape[0]
    m = bk // g
    scale = 1.0 / (d ** 0.5)

    # q/ctx ride head-major [H, BK, D]: blocks are then (H, M, D) whose
    # last two dims are aligned. Tiny per-step activations, never the cache.
    q_t = q.swapaxes(0, 1)

    grid = (g,)
    q_spec = pl.BlockSpec((h, m, d), lambda i: (0, i, 0))
    kv_spec = pl.BlockSpec((h, m, t, d), lambda i: (0, i, 0, 0))
    sc_spec = pl.BlockSpec((h, m, t, 1), lambda i: (0, i, 0, 0))
    bias_spec = pl.BlockSpec((1, m, m * t), lambda i: (i, 0, 0))
    out_spec = pl.BlockSpec((h, m, d), lambda i: (0, i, 0))
    out_shape = jax.ShapeDtypeStruct((h, bk, d), jnp.float32)

    if k_scale is not None:
        ctx = pl.pallas_call(
            functools.partial(_kernel_q, scale=scale),
            grid=grid,
            in_specs=[q_spec, kv_spec, sc_spec, kv_spec, sc_spec, bias_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(q_t, k, k_scale, v, v_scale, bias)
    else:
        ctx = pl.pallas_call(
            functools.partial(_kernel, scale=scale),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(q_t, k, v, bias)
    return ctx.swapaxes(0, 1)
