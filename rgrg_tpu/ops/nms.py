"""Non-maximum suppression with static shapes.

Replaces torchvision's C++/CUDA `nms` (invoked by the reference inside
RPN.filter_proposals, custom_rpn.py:71; IoU 0.7, up to 1000/2000 proposals).

Design: callers pass boxes already *sorted by score descending* (they come
out of `jax.lax.top_k`, which sorts) plus a validity mask, and receive a keep
mask over the same, fixed-size array — no compaction, no dynamic shapes.
Relative score order is preserved downstream, so tie-breaking in later
argmax-style selection matches the reference's compacted lists.

Two implementations, both exact:
  - `nms_keep_mask`: O(N) sequential `fori_loop` over the IoU matrix.
  - `nms_keep_mask_tiled`: tile-parallel formulation (the TPU-friendly
    O(N/T)-depth algorithm): tiles suppress later tiles via dense matrix ops;
    within-tile suppression runs a short fixpoint iteration. Used by default
    for N >= 256.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rgrg_tpu.ops.boxes import box_iou


def nms_keep_mask(boxes: jnp.ndarray, valid: jnp.ndarray,
                  iou_threshold: float) -> jnp.ndarray:
    """Exact greedy NMS over score-desc-sorted boxes.

    boxes: [N, 4] sorted by score descending; valid: [N] bool.
    Returns keep: [N] bool (False wherever valid is False).
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    later = jnp.arange(n)[None, :] > jnp.arange(n)[:, None]
    suppress = (iou > iou_threshold) & later  # [N, N]: i suppresses j (j later)

    def body(i, keep):
        row = suppress[i] & keep[i]
        return keep & ~row

    keep = jax.lax.fori_loop(0, n, body, valid)
    return keep


def _self_suppress_tile(sup_tile: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Greedy NMS within one score-sorted tile via fixpoint iteration.

    sup_tile: [T, T] bool, already thresholded (sup_tile[i, j] == IoU(i,j) > t);
    valid: [T] bool. Returns keep mask [T].

    Start assuming all valid boxes are kept; repeatedly recompute "suppressed
    by a currently-kept earlier box" until the set stops changing. Exactness:
    by induction over score positions, a box whose relevant predecessors have
    stabilized to their greedy value stabilizes on the next iteration, so the
    loop reaches the greedy set in at most max-chain-depth (<= T) iterations
    and then stays there.
    """
    t = sup_tile.shape[0]
    later = jnp.arange(t)[None, :] > jnp.arange(t)[:, None]
    sup = sup_tile & later

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it <= t)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(sup & keep[:, None], axis=0)
        return valid & ~suppressed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.int32(0)))
    return keep


@functools.partial(jax.jit, static_argnames=("iou_threshold", "tile"))
def nms_keep_mask_tiled(boxes: jnp.ndarray, valid: jnp.ndarray,
                        iou_threshold: float, tile: int = 128) -> jnp.ndarray:
    """Exact greedy NMS with tile-level parallelism.

    Processes score-sorted boxes in tiles of `tile`: each finished tile
    suppresses all later tiles with one dense masked-any; within a tile a
    short while-loop fixpoint resolves suppression chains. Depth is
    O(N/tile + chain length) instead of O(N).
    """
    n = boxes.shape[0]
    pad = (-n) % tile
    if pad:
        boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4), boxes.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    npad = n + pad
    num_tiles = npad // tile

    iou = box_iou(boxes, boxes) > iou_threshold  # [npad, npad] bool
    keep = valid

    def body(i, keep):
        start = i * tile
        tile_valid = jax.lax.dynamic_slice_in_dim(keep, start, tile)
        tile_iou = jax.lax.dynamic_slice(iou, (start, start), (tile, tile))
        tile_keep = _self_suppress_tile(tile_iou, tile_valid)
        keep = jax.lax.dynamic_update_slice_in_dim(keep, tile_keep, start, axis=0)
        # kept boxes of this tile suppress everything later
        rows = jax.lax.dynamic_slice_in_dim(iou, start, tile, axis=0)  # [T, npad]
        suppressed_later = jnp.any(rows & tile_keep[:, None], axis=0)
        later = jnp.arange(npad) >= start + tile
        return keep & ~(suppressed_later & later)

    keep = jax.lax.fori_loop(0, num_tiles, body, keep)
    return keep[:n]


def nms(boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Default dispatch: tiled for large N, sequential for small."""
    if boxes.shape[0] >= 256:
        return nms_keep_mask_tiled(boxes, valid, iou_threshold)
    return nms_keep_mask(boxes, valid, iou_threshold)
