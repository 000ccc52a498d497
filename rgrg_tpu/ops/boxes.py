"""Vectorized box math in pure jnp.

Re-provides (TPU-native) the torchvision C++ box ops the reference leans on:
box coder encode/decode (`custom_rpn.py:69,76`, `custom_roi_heads.py:125`),
`clip_boxes_to_image` (`custom_roi_heads.py:176`), IoU matrices.

All functions are shape-polymorphic over leading batch dims and jit-safe.
Boxes are `[..., 4]` in (x1, y1, x2, y2) corner format.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# torchvision clamps dw/dh before exp at log(1000/16)
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def decode_boxes(deltas: jnp.ndarray, boxes: jnp.ndarray,
                 weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
                 ) -> jnp.ndarray:
    """Apply regression deltas to reference boxes.

    deltas: [..., K*4] (K classes of deltas per box), boxes: [..., 4].
    Returns [..., K, 4]. Matches torchvision BoxCoder.decode_single.
    """
    boxes = boxes.astype(deltas.dtype)
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    k4 = deltas.shape[-1]
    assert k4 % 4 == 0, f"deltas last dim {k4} not a multiple of 4"
    k = k4 // 4
    d = deltas.reshape(deltas.shape[:-1] + (k, 4))
    wx, wy, ww, wh = weights
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = jnp.minimum(d[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(d[..., 3] / wh, BBOX_XFORM_CLIP)

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    # corners; torchvision uses c_to_c_w = 0.5 * pred_w
    x1 = pred_ctr_x - 0.5 * pred_w
    y1 = pred_ctr_y - 0.5 * pred_h
    x2 = pred_ctr_x + 0.5 * pred_w
    y2 = pred_ctr_y + 0.5 * pred_h
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def encode_boxes(reference_boxes: jnp.ndarray, proposals: jnp.ndarray,
                 weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
                 ) -> jnp.ndarray:
    """Inverse of decode: regression targets that map `proposals` onto
    `reference_boxes` (both [..., 4]). Matches torchvision encode_boxes."""
    wx, wy, ww, wh = weights
    ex_widths = proposals[..., 2] - proposals[..., 0]
    ex_heights = proposals[..., 3] - proposals[..., 1]
    ex_ctr_x = proposals[..., 0] + 0.5 * ex_widths
    ex_ctr_y = proposals[..., 1] + 0.5 * ex_heights

    gt_widths = reference_boxes[..., 2] - reference_boxes[..., 0]
    gt_heights = reference_boxes[..., 3] - reference_boxes[..., 1]
    gt_ctr_x = reference_boxes[..., 0] + 0.5 * gt_widths
    gt_ctr_y = reference_boxes[..., 1] + 0.5 * gt_heights

    dx = wx * (gt_ctr_x - ex_ctr_x) / ex_widths
    dy = wy * (gt_ctr_y - ex_ctr_y) / ex_heights
    dw = ww * jnp.log(gt_widths / ex_widths)
    dh = wh * jnp.log(gt_heights / ex_heights)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def clip_boxes_to_image(boxes: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    """Clamp corners into [0, W] x [0, H] (torchvision clip_boxes_to_image)."""
    x = jnp.clip(boxes[..., 0::2], 0.0, width)
    y = jnp.clip(boxes[..., 1::2], 0.0, height)
    out = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)
    return out


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix [N, M] for boxes1 [N,4], boxes2 [M,4]."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union


def remove_small_boxes_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """Boolean mask of boxes with both sides >= min_size
    (torchvision remove_small_boxes)."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)
