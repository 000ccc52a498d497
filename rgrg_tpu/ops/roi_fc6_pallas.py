"""Fused RoIAlign + avg-pool + fc6 Pallas kernel.

The RoI head's dominant cost is not FLOPs but the pooled-feature
materialization: [B, K, 8, 8, 2048] plus the RoIAlign intermediate are
~12 GB of HBM round-trips per 24-image batch before fc6 even runs. This
kernel keeps both entirely in VMEM.

Grid: (batch b, proposal chunk cc, channel tile j, roi block i). The fc6
output block [CHUNK, 1024] has its index map ignore (j, i), so every visit
for a given (b, cc) is CONSECUTIVE — the Pallas-valid accumulation pattern:
row group i is initialized at j==0 and accumulated for j>0. The 2 MB W6
channel slab stays resident across the inner i steps.

  per grid step:
    Ay/Ax interpolation weights for ROI block i       (VPU)
    pooled = Ay @ F_tile @ Ax^T                       (MXU, VMEM only)
    box_features[b, cc*i rows, tile j] = mean(pooled) (written once)
    fc6[b, cc][rows i] (+)= flat(pooled) @ W6_tile    (MXU, acc over j)

Mosaic constraints honored (see CLAUDE.md): no multi-dim dot contractions,
no 3-way dim merges, no value dynamic_slice — the p-axis of the fc6
contraction is a static 8-step unroll reading weight slabs from the ref.

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
CHUNK = 128  # proposals per fc6 output block / matmul M-dim (full MXU rows)


def _kernel(boxes_ref, feats_ref, w6_ref, fc6_ref, bf_ref, pooled_ref, *,
            spatial_scale: float, output_size: int, sampling: int,
            height: int, width: int):
    j = pl.program_id(2)
    p = output_size
    ct = feats_ref.shape[3]
    rep = fc6_ref.shape[2]
    r = ROI_BLOCK
    nblocks = CHUNK // ROI_BLOCK

    f = feats_ref[0].astype(jnp.float32)                       # [H, W, CT]
    f2 = f.reshape(height, width * ct)

    # phase 1: RoIAlign the whole chunk into VMEM scratch (bf16), ROI_BLOCK
    # rows at a time (keeps the [R*P, W*CT] intermediate small)
    def pool_body(i, _):
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

        bf_ref[0, pl.ds(i * r, r), :] = jnp.mean(pooled, axis=(1, 2))
        # scratch layout [Pp, CHUNK, Pq, CT]: phase 2's traced p-index hits
        # an untiled leading dim (Mosaic needs 8-aligned traced offsets on
        # the tiled last-two dims) and the lane dim stays CT-wide; written
        # as P static slices, no transposes
        for pi in range(p):
            pooled_ref[pi, pl.ds(i * r, r)] = (
                pooled[:, :, pi, :].astype(jnp.bfloat16))
        return 0

    jax.lax.fori_loop(0, nblocks, pool_body, 0)

    # phase 2: fc6 over the full chunk — [CHUNK, Q*CT] @ [Q*CT, REP] keeps
    # the MXU M-dimension full (ROI_BLOCK-row matmuls run at 25% util).
    # Refs are sliced with the traced p index (values can't be dynamically
    # sliced in Mosaic; unrolling materializes all weight slabs at once).
    def fc6_body(pi, acc):
        lhs = pooled_ref[pi].reshape(CHUNK, p * ct)
        rhs = w6_ref[pi].reshape(p * ct, rep)
        return acc + jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)

    partial = jax.lax.fori_loop(0, p, fc6_body,
                                jnp.zeros((CHUNK, rep), jnp.float32))

    @pl.when(j == 0)
    def _():
        fc6_ref[0] = partial

    @pl.when(j > 0)
    def _():
        fc6_ref[0] = fc6_ref[0] + partial


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
    pad_n = (-n) % CHUNK
    if pad_n:
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((bsz, pad_n, 4), boxes.dtype)], axis=1)
    npad = n + pad_n
    ct = min(CH_TILE, c)
    assert c % ct == 0
    num_ct = c // ct
    nchunks = npad // CHUNK
    nblocks = CHUNK // ROI_BLOCK
    total_blocks = npad // ROI_BLOCK

    flat_boxes = boxes.astype(jnp.float32).reshape(bsz * npad, 4)
    w6_tiled = w6.reshape(p, p, c, rep).astype(jnp.bfloat16)

    fc6, bf = pl.pallas_call(
        functools.partial(_kernel, spatial_scale=spatial_scale,
                          output_size=p, sampling=sampling_ratio,
                          height=h, width=w),
        grid=(bsz, nchunks, num_ct),
        in_specs=[
            pl.BlockSpec(
                (CHUNK, 4),
                lambda b, cc, j: (b * nchunks + cc, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, ct), lambda b, cc, j: (b, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, p, ct, rep), lambda b, cc, j: (0, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, CHUNK, rep), lambda b, cc, j: (b, cc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, ct), lambda b, cc, j: (b, cc, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, npad, rep), jnp.float32),
            jax.ShapeDtypeStruct((bsz, npad, c), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((p, CHUNK, p, ct), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(flat_boxes, features, w6_tiled)
    return fc6[:, :n], bf[:, :n]
