"""Pallas TPU kernel for greedy NMS.

Fuses the whole tiled-NMS pipeline of rgrg_tpu.ops.nms (IoU + tile
self-suppression fixpoint + cross-tile suppression) into one VMEM-resident
kernel: boxes (N x 4 f32, ~16 KB for N=1024) and the keep mask never leave
VMEM between stages, eliminating the HBM round-trips between XLA's many
small ops in the lax version.

Exact greedy semantics (same proof as ops.nms._self_suppress_tile): boxes
arrive score-sorted; a tile resolves internal suppression by fixpoint
iteration, then its kept boxes suppress all later boxes via one [T, N]
masked-max.

Mosaic lowering notes (hit in practice on v5e):
  - while_loop carries must be >=2-D and non-bool -> all masks are f32 0/1
    column vectors;
  - fancy indexing like `a[:, None, 0]` lowers to an unsupported gather ->
    boxes are passed in BOTH [N, 4] and transposed [4, N] layouts so every
    coordinate access is a basic 2-D slice broadcast ([T, 1] x [1, N]).

Use `nms_keep_mask_pallas(boxes, valid, iou_threshold)`; it pads N to the
tile size. CPU tests run via interpret mode (tests/test_nms_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _iou_rows_cols(a: jnp.ndarray, bt: jnp.ndarray) -> jnp.ndarray:
    """a: [T, 4] row boxes; bt: [4, M] column boxes (transposed layout).
    Returns IoU [T, M] using only basic slices + broadcasts."""
    ax1, ay1, ax2, ay2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]   # [T, 1]
    bx1, by1, bx2, by2 = bt[0:1, :], bt[1:2, :], bt[2:3, :], bt[3:4, :]  # [1, M]
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    x1 = jnp.maximum(ax1, bx1)
    y1 = jnp.maximum(ay1, by1)
    x2 = jnp.minimum(ax2, bx2)
    y2 = jnp.minimum(ay2, by2)
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    return inter / (area_a + area_b - inter)


def _nms_kernel(boxes_ref, boxes_t_ref, valid_ref, keep_ref, *,
                iou_threshold: float, num_tiles: int):
    n = boxes_ref.shape[0]
    keep_ref[:, :] = valid_ref[:, :]  # f32 0/1 masks [N, 1]

    later_tt = (jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
                > jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0))
    col_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def tile_body(i, _):
        start = i * TILE
        tile_boxes = boxes_ref[pl.ds(start, TILE), :]          # [T, 4]
        tile_boxes_t = boxes_t_ref[:, pl.ds(start, TILE)]      # [4, T]
        tile_keep = keep_ref[pl.ds(start, TILE), :]            # [T, 1] f32

        # --- within-tile fixpoint (exact greedy) ---
        iou_tt = _iou_rows_cols(tile_boxes, tile_boxes_t)
        sup = jnp.where((iou_tt > iou_threshold) & later_tt, 1.0, 0.0)

        def fix_cond(state):
            keep, prev, it = state
            return jnp.any(keep != prev) & (it <= TILE)

        def fix_body(state):
            keep, _, it = state
            # suppressed[j] = max_i sup[i, j] * keep[i]
            suppressed = jnp.max(sup * keep, axis=0)[:, None]  # [T, 1]
            return tile_keep * (1.0 - suppressed), keep, it + 1

        resolved, _, _ = jax.lax.while_loop(
            fix_cond, fix_body,
            (tile_keep, jnp.zeros_like(tile_keep), jnp.int32(0)))
        keep_ref[pl.ds(start, TILE), :] = resolved

        # --- suppress all later boxes in one pass ---
        iou_tn = _iou_rows_cols(tile_boxes, boxes_t_ref[:, :])  # [T, N]
        sup_tn = jnp.where(iou_tn > iou_threshold, 1.0, 0.0)
        suppressed_later = jnp.max(sup_tn * resolved, axis=0)[:, None]  # [N, 1]
        is_later = (col_n >= start + TILE).astype(jnp.float32)
        keep_ref[:, :] = keep_ref[:, :] * (1.0 - suppressed_later * is_later)
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_keep_mask_pallas(boxes: jnp.ndarray, valid: jnp.ndarray,
                         iou_threshold: float,
                         interpret: bool = False) -> jnp.ndarray:
    """boxes: [N, 4] f32 score-desc-sorted; valid: [N] bool. Returns [N] bool."""
    n = boxes.shape[0]
    pad = (-n) % TILE
    if pad:
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((pad, 4), boxes.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    npad = n + pad
    num_tiles = npad // TILE
    boxes = boxes.astype(jnp.float32)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold=iou_threshold,
                          num_tiles=num_tiles),
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes, boxes.T, valid[:, None].astype(jnp.float32))
    return keep[:n, 0] > 0.5
