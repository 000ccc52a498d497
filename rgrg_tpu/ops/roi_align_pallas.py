"""Pallas TPU kernel for RoIAlign (separable-matmul formulation, fused).

Same math as rgrg_tpu.ops.roi_align (each pooled bin = Ay @ F @ Ax^T with
per-ROI 1-D interpolation matrices) but fused into one kernel: the
interpolation-weight construction, both MXU contractions, and the [R, 8,
16, C] intermediate all stay in VMEM — the XLA path round-trips that
intermediate through HBM between its two einsums.

Grid: (roi_blocks, channel_tiles). Per program: an ROI block's boxes
[R, 4], the feature-map channel tile [16, 16, CT], output tile
[R, 8, 8, CT].

The XLA path remains the default (it is already MXU-bound); this kernel is
the fusion variant for the serving path and is golden-tested against the
XLA implementation (tests/test_roi_align_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROI_BLOCK = 32   # sized so tmp + out + transpose copies fit 16MB VMEM
CH_TILE = 256


def _axis_weights_block(start: jnp.ndarray, bin_size: jnp.ndarray,
                        extent: int, pooled: int, sampling: int) -> jnp.ndarray:
    """Vectorized interpolation weights for an ROI block.

    start/bin_size: [R]. Returns [R, pooled, extent] f32.
    Same semantics as ops.roi_align._axis_weights. The sampling loop is
    unrolled (sampling == 2 in this model) so every tensor stays 3-D —
    Mosaic rejects the 4-D one-hot formulation.
    """
    r = start.shape[0]
    p = jax.lax.broadcasted_iota(jnp.int32, (r, pooled, 1), 1).astype(jnp.float32)
    grid = jax.lax.broadcasted_iota(
        jnp.int32, (r, pooled, extent), 2).astype(jnp.float32)
    b = bin_size[:, None, None]

    acc = jnp.zeros((r, pooled, extent), jnp.float32)
    for s in range(sampling):
        y = start[:, None, None] + p * b + (s + 0.5) * b / sampling  # [R, P, 1]
        valid = (y >= -1.0) & (y <= extent)
        yc = jnp.maximum(y, 0.0)
        y_low = jnp.floor(yc)
        cap = y_low >= extent - 1
        y_low = jnp.where(cap, extent - 1.0, y_low)
        y_high = jnp.where(cap, extent - 1.0, y_low + 1.0)
        ly = jnp.where(cap, 0.0, yc - y_low)
        hy = 1.0 - ly
        w = (hy * (grid == y_low).astype(jnp.float32)
             + ly * (grid == y_high).astype(jnp.float32))
        acc = acc + w * valid.astype(jnp.float32)
    return acc / sampling


def _roi_align_kernel(boxes_ref, feats_ref, out_ref, *, spatial_scale: float,
                      output_size: int, sampling: int, height: int, width: int):
    boxes = boxes_ref[:, :]                                    # [R, 4]
    r = boxes.shape[0]
    ct = feats_ref.shape[2]
    p = output_size

    start_w = boxes[:, 0] * spatial_scale
    start_h = boxes[:, 1] * spatial_scale
    roi_w = jnp.maximum(boxes[:, 2] * spatial_scale - start_w, 1.0)
    roi_h = jnp.maximum(boxes[:, 3] * spatial_scale - start_h, 1.0)

    ay = _axis_weights_block(start_h, roi_h / p, height, p, sampling)  # [R,P,H]
    ax = _axis_weights_block(start_w, roi_w / p, width, p, sampling)   # [R,P,W]

    f = feats_ref[:, :, :].astype(jnp.float32)                 # [H, W, CT]
    # contraction 1 on the MXU: [R*P, H] @ [H, W*CT]
    tmp = jnp.dot(ay.reshape(r * p, height),
                  f.reshape(height, width * ct),
                  preferred_element_type=jnp.float32)          # [R*P, W*CT]
    tmp = tmp.reshape(r, p, width, ct)
    # contraction 2, batched over ROIs with multi-free-dim rhs:
    # Ax [R, Pq, W] x tmp [R, Pp, W, CT] contracting W -> [R, Pq, Pp, CT]
    out = jax.lax.dot_general(ax, tmp,
                              dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    out_ref[:, :, :, :] = jnp.transpose(out, (0, 2, 1, 3))     # -> [R, Pp, Pq, CT]


def _batched_kernel(boxes_ref, feats_ref, out_ref, **kw):
    """Batched wrapper: boxes arrive flattened 2-D (Mosaic rejects 3-D
    blocks whose minor dim is 4); feats/out carry a leading unit batch dim."""
    _roi_align_kernel(boxes_ref, feats_ref.at[0], out_ref.at[0], **kw)


@functools.partial(jax.jit, static_argnames=(
    "output_size", "spatial_scale", "sampling_ratio", "interpret"))
def roi_align_pallas_batched(features: jnp.ndarray, boxes: jnp.ndarray, *,
                             output_size: int = 8,
                             spatial_scale: float = 1.0 / 32.0,
                             sampling_ratio: int = 2,
                             interpret: bool = False) -> jnp.ndarray:
    """features: [B, H, W, C]; boxes: [B, N, 4] -> [B, N, P, P, C] f32.

    The batch is a grid dimension (one fused kernel launch), unlike
    vmap(roi_align_pallas) which dispatches per image.
    """
    bsz, h, w, c = features.shape
    n = boxes.shape[1]
    pad_n = (-n) % ROI_BLOCK
    if pad_n:
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((bsz, pad_n, 4), boxes.dtype)], axis=1)
    npad = n + pad_n
    ct = min(CH_TILE, c)
    assert c % ct == 0
    nblocks = npad // ROI_BLOCK
    flat_boxes = boxes.astype(jnp.float32).reshape(bsz * npad, 4)

    out = pl.pallas_call(
        functools.partial(_batched_kernel, spatial_scale=spatial_scale,
                          output_size=output_size, sampling=sampling_ratio,
                          height=h, width=w),
        grid=(bsz, nblocks, c // ct),
        in_specs=[
            pl.BlockSpec((ROI_BLOCK, 4),
                         lambda b, i, j: (b * nblocks + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, ct), lambda b, i, j: (b, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ROI_BLOCK, output_size, output_size, ct),
                               lambda b, i, j: (b, i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, npad, output_size, output_size, c), jnp.float32),
        interpret=interpret,
    )(flat_boxes, features)
    return out[:, :n]


@functools.partial(jax.jit, static_argnames=(
    "output_size", "spatial_scale", "sampling_ratio", "interpret"))
def roi_align_pallas(features: jnp.ndarray, boxes: jnp.ndarray, *,
                     output_size: int = 8, spatial_scale: float = 1.0 / 32.0,
                     sampling_ratio: int = 2,
                     interpret: bool = False) -> jnp.ndarray:
    """features: [H, W, C]; boxes: [N, 4] -> [N, P, P, C] f32."""
    h, w, c = features.shape
    n = boxes.shape[0]
    pad_n = (-n) % ROI_BLOCK
    if pad_n:
        boxes = jnp.concatenate([boxes, jnp.zeros((pad_n, 4), boxes.dtype)])
    npad = n + pad_n
    assert c % CH_TILE == 0 or c <= CH_TILE, f"channels {c} vs tile {CH_TILE}"
    ct = min(CH_TILE, c)

    out = pl.pallas_call(
        functools.partial(_roi_align_kernel, spatial_scale=spatial_scale,
                          output_size=output_size, sampling=sampling_ratio,
                          height=h, width=w),
        grid=(npad // ROI_BLOCK, c // ct),
        in_specs=[
            pl.BlockSpec((ROI_BLOCK, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w, ct), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROI_BLOCK, output_size, output_size, ct),
                               lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, output_size, output_size, c),
                                       jnp.float32),
        interpret=interpret,
    )(boxes.astype(jnp.float32), features)
    return out[:n]
