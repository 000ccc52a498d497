"""Fused RoIAlign + avg-pool + fc6 Pallas kernel.

The RoI head's dominant cost is not FLOPs but the pooled-feature
materialization: [B, K, 8, 8, 2048] plus the RoIAlign intermediate are
~12 GB of HBM round-trips per 24-image batch before fc6 even runs. This
kernel keeps both entirely in VMEM.

Grid: (batch b, channel tile j) — j innermost so the fc6 output block
[N, 1024] stays resident and is revisited CONSECUTIVELY across j (the
Pallas-valid accumulation pattern), while the 2 MB W6 channel slab is
fetched once per (b, j). ROI blocks are an in-kernel loop:

  for each ROI block i:
    Ay/Ax interpolation weights                       (VPU)
    pooled = Ay @ F_tile @ Ax^T                       (MXU, VMEM only)
    box_features[b, block i, tile j] = mean(pooled)   (written once)
    fc6[b, block i] (+)= flatten(pooled) @ W6_tile    (MXU, acc across j)

Weight layout: fc6's kernel is passed reshaped [8, 8, C, 1024] so a channel
tile is a contiguous slab. Bias + ReLU + fc7 stay in XLA (tiny).

Returns (fc6_pre [B, N, 1024] f32 — pre-bias/activation, box_features
[B, N, C] f32). Golden-tested against the XLA composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rgrg_tpu.ops.roi_align_pallas import _axis_weights_block

ROI_BLOCK = 32
CH_TILE = 128


def _kernel(boxes_ref, feats_ref, w6_ref, fc6_ref, bf_ref, *,
            spatial_scale: float, output_size: int, sampling: int,
            height: int, width: int, nblocks: int):
    j = pl.program_id(1)
    p = output_size
    ct = feats_ref.shape[3]
    rep = w6_ref.shape[-1]
    r = ROI_BLOCK

    f = feats_ref[0].astype(jnp.float32)                       # [H, W, CT]
    f2 = f.reshape(height, width * ct)
    w6 = w6_ref[:].reshape(p * p * ct, rep)                    # [P*P*CT, 1024]

    def block_body(i, _):
        boxes = boxes_ref[pl.ds(i * r, r), :]                  # [R, 4]
        start_w = boxes[:, 0] * spatial_scale
        start_h = boxes[:, 1] * spatial_scale
        roi_w = jnp.maximum(boxes[:, 2] * spatial_scale - start_w, 1.0)
        roi_h = jnp.maximum(boxes[:, 3] * spatial_scale - start_h, 1.0)

        ay = _axis_weights_block(start_h, roi_h / p, height, p, sampling)
        ax = _axis_weights_block(start_w, roi_w / p, width, p, sampling)

        tmp = jnp.dot(ay.reshape(r * p, height), f2,
                      preferred_element_type=jnp.float32)      # [R*P, W*CT]
        tmp = tmp.reshape(r, p, width, ct)
        pooled = jax.lax.dot_general(
            ax, tmp, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                # [R, Pq, Pp, CT]
        pooled = jnp.transpose(pooled, (0, 2, 1, 3))           # [R, Pp, Pq, CT]

        bf_ref[0, pl.ds(i * r, r), :] = jnp.mean(pooled, axis=(1, 2))

        flat = pooled.reshape(r, p * p * ct)
        partial = jnp.dot(flat.astype(jnp.bfloat16), w6,
                          preferred_element_type=jnp.float32)  # [R, rep]

        @pl.when(j == 0)
        def _():
            fc6_ref[0, pl.ds(i * r, r), :] = partial

        @pl.when(j > 0)
        def _():
            fc6_ref[0, pl.ds(i * r, r), :] = (
                fc6_ref[0, pl.ds(i * r, r), :] + partial)
        return 0

    jax.lax.fori_loop(0, nblocks, block_body, 0)


@functools.partial(jax.jit, static_argnames=(
    "output_size", "spatial_scale", "sampling_ratio", "interpret"))
def roi_align_fc6(features: jnp.ndarray, boxes: jnp.ndarray,
                  w6: jnp.ndarray, *,
                  output_size: int = 8, spatial_scale: float = 1.0 / 32.0,
                  sampling_ratio: int = 2, interpret: bool = False):
    """features: [B, H, W, C]; boxes: [B, N, 4]; w6: [P*P*C, 1024] fc6 kernel
    in the framework's spatial-major flatten order.

    Returns (fc6_pre [B, N, 1024] f32, box_features [B, N, C] f32).
    """
    bsz, h, w, c = features.shape
    n = boxes.shape[1]
    p = output_size
    rep = w6.shape[-1]
    pad_n = (-n) % ROI_BLOCK
    if pad_n:
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((bsz, pad_n, 4), boxes.dtype)], axis=1)
    npad = n + pad_n
    ct = min(CH_TILE, c)
    assert c % ct == 0
    num_ct = c // ct
    nblocks = npad // ROI_BLOCK

    flat_boxes = boxes.astype(jnp.float32).reshape(bsz * npad, 4)
    w6_tiled = w6.reshape(p, p, c, rep).astype(jnp.bfloat16)

    fc6, bf = pl.pallas_call(
        functools.partial(_kernel, spatial_scale=spatial_scale,
                          output_size=p, sampling=sampling_ratio,
                          height=h, width=w, nblocks=nblocks),
        grid=(bsz, num_ct),
        in_specs=[
            pl.BlockSpec((npad, 4), lambda b, j: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, ct), lambda b, j: (b, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, p, ct, rep), lambda b, j: (0, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, npad, rep), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, ct), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, npad, rep), jnp.float32),
            jax.ShapeDtypeStruct((bsz, npad, c), jnp.float32),
        ),
        interpret=interpret,
    )(flat_boxes, features, w6_tiled)
    return fc6[:, :n], bf[:, :n]
