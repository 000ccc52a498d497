"""RoIAlign, TPU-native.

Replaces torchvision's C++/CUDA `roi_align` (used by the reference via
MultiScaleRoIAlign at object_detector.py:106, custom_roi_heads.py:232, and
directly on user boxes at evaluate_bbox_variations.py:92-109).

Instead of translating the CUDA gather kernel, we exploit that bilinear
interpolation over the (sampling_ratio x sampling_ratio) tensor-product
sample grid is *separable*: every pooled bin equals

    out[ph, pw, c] = Ay[ph, :] @ F[:, :, c] @ Ax[pw, :]^T

where Ay [P, H] / Ax [P, W] are per-ROI 1-D interpolation-weight matrices
(each row is the average of the `sampling_ratio` bilinear row-weight vectors
of that bin's sample points). Averaging over sample points factorizes across
axes because the sample grid is a tensor product and interpolation weights
are outer products. This makes RoIAlign two batched matmuls — MXU work, not
scatter/gather — while reproducing torchvision's semantics exactly
(aligned=False half-pixel rules, min box size 1.0, out-of-range sample
dropping, edge clamping).

`roi_align` is exact vs. the CUDA kernel up to float associativity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _axis_weights(start: jnp.ndarray, bin_size: jnp.ndarray, extent: int,
                  pooled: int, sampling_ratio: int) -> jnp.ndarray:
    """Per-axis interpolation weights for one ROI.

    start: scalar ROI start in feature coords; bin_size: scalar bin extent.
    Returns [pooled, extent]: row `p` maps feature-axis values to the bin-`p`
    average of its `sampling_ratio` sample points.
    """
    p = jnp.arange(pooled, dtype=start.dtype)[:, None]          # [P, 1]
    s = jnp.arange(sampling_ratio, dtype=start.dtype)[None, :]  # [1, S]
    # sample coordinate: start + p*bin + (s + .5) * bin / S
    y = start + p * bin_size + (s + 0.5) * bin_size / sampling_ratio  # [P, S]

    valid = (y >= -1.0) & (y <= extent)
    yc = jnp.maximum(y, 0.0)
    y_low = jnp.floor(yc).astype(jnp.int32)
    cap = y_low >= extent - 1
    y_low = jnp.where(cap, extent - 1, y_low)
    y_high = jnp.where(cap, extent - 1, y_low + 1)
    ly = jnp.where(cap, 0.0, yc - y_low.astype(yc.dtype))
    hy = 1.0 - ly

    w = (hy[..., None] * jax.nn.one_hot(y_low, extent, dtype=y.dtype)
         + ly[..., None] * jax.nn.one_hot(y_high, extent, dtype=y.dtype))  # [P, S, E]
    w = w * valid[..., None]
    # mean over sample points (torchvision divides by the full count even if
    # some points were dropped as out-of-range; zero rows preserve that)
    return w.mean(axis=1)  # [P, E]


def roi_align_weights(boxes: jnp.ndarray, height: int, width: int,
                      output_size: int, spatial_scale: float,
                      sampling_ratio: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Interpolation matrices for a set of boxes.

    boxes: [N, 4] (x1, y1, x2, y2) in image coordinates.
    Returns (Ay [N, P, H], Ax [N, P, W]) in float32.
    """
    boxes = boxes.astype(jnp.float32)
    start_w = boxes[:, 0] * spatial_scale
    start_h = boxes[:, 1] * spatial_scale
    end_w = boxes[:, 2] * spatial_scale
    end_h = boxes[:, 3] * spatial_scale
    # aligned=False legacy behavior: no -0.5 offset, min size 1
    roi_w = jnp.maximum(end_w - start_w, 1.0)
    roi_h = jnp.maximum(end_h - start_h, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    ay = jax.vmap(lambda s, b: _axis_weights(s, b, height, output_size, sampling_ratio))(
        start_h, bin_h)
    ax = jax.vmap(lambda s, b: _axis_weights(s, b, width, output_size, sampling_ratio))(
        start_w, bin_w)
    return ay, ax


@functools.partial(jax.jit, static_argnames=("output_size", "spatial_scale",
                                              "sampling_ratio", "compute_dtype"))
def roi_align(features: jnp.ndarray, boxes: jnp.ndarray, *,
              output_size: int = 8, spatial_scale: float = 1.0 / 32.0,
              sampling_ratio: int = 2,
              compute_dtype=jnp.float32) -> jnp.ndarray:
    """RoIAlign one image's feature map over N boxes.

    features: [H, W, C] (single level; C5 of the backbone).
    boxes: [N, 4] in image coordinates, (x1, y1, x2, y2).
    Returns [N, output_size, output_size, C] in compute_dtype.

    compute_dtype=float32 runs the contractions at HIGHEST precision (on TPU
    the MXU would otherwise run f32 matmuls as bf16 passes, ~1e-3 error,
    breaking parity with the CUDA kernel — negligible FLOPs either way);
    bfloat16 is the serving fast path (weights stay f32).
    """
    h, w, _ = features.shape
    ay, ax = roi_align_weights(boxes, h, w, output_size, spatial_scale, sampling_ratio)
    if compute_dtype == jnp.float32:
        precision = jax.lax.Precision.HIGHEST
        f = features.astype(jnp.float32)
    else:
        precision = None
        f = features.astype(compute_dtype)
        ay = ay.astype(compute_dtype)
        ax = ax.astype(compute_dtype)
    # [N,P,H] @ [H,W,C] -> [N,P,W,C]; then contract W with Ax -> [N,P,P,C]
    tmp = jnp.einsum("nph,hwc->npwc", ay, f,
                     preferred_element_type=compute_dtype, precision=precision)
    out = jnp.einsum("npwc,nqw->npqc", tmp, ax,
                     preferred_element_type=compute_dtype, precision=precision)
    return out


def roi_align_batched(features: jnp.ndarray, boxes: jnp.ndarray, **kw) -> jnp.ndarray:
    """vmap over a batch: features [B, H, W, C], boxes [B, N, 4]
    -> [B, N, P, P, C]."""
    return jax.vmap(lambda f, b: roi_align(f, b, **kw))(features, boxes)


@functools.partial(jax.jit, static_argnames=("output_size", "spatial_scale",
                                              "sampling_ratio", "compute_dtype"))
def roi_align_fused_batched(features: jnp.ndarray, boxes: jnp.ndarray, *,
                            output_size: int = 8,
                            spatial_scale: float = 1.0 / 32.0,
                            sampling_ratio: int = 2,
                            compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """RoIAlign as ONE batched matmul: out = (Ay ⊗ Ax) @ F.

    Same math as `roi_align` (out[n,p,q,c] = Σ_{h,w} Ay[n,p,h] Ax[n,q,w]
    F[h,w,c]) but with the two separable contractions FUSED by building the
    combined weight W2[n, (p,q), (h,w)] = Ay[n,p,h]·Ax[n,q,w] explicitly and
    contracting the (h,w) axis once. The separable form does ~5x fewer FLOPs
    but materializes a [B, N, P, W, C] intermediate in HBM between its two
    einsums (~3.2 GB/chunk at serving shapes — write+read ≈ the observed
    ~7 ms/chunk); the fused form's traffic is just W2 (~200 MB) + the pooled
    output, and its single [B, N·P², H·W] @ [B, H·W, C] matmul has MXU-clean
    dims (K = H·W = 256). Serving fast path; the f32 parity path keeps the
    separable form (exact torchvision associativity, ops above).

    features: [B, H, W, C]; boxes: [B, N, 4] -> [B, N, P, P, C] compute_dtype.
    """
    bsz, h, w, c = features.shape
    n = boxes.shape[1]
    p = output_size

    def weights(bx):
        ay, ax = roi_align_weights(bx, h, w, p, spatial_scale, sampling_ratio)
        w2 = jnp.einsum("nph,nqw->npqhw", ay, ax)          # f32, [N,P,P,H,W]
        return w2.reshape(n, p * p, h * w).astype(compute_dtype)

    w2 = jax.vmap(weights)(boxes)                           # [B, N, P*P, H*W]
    f = features.astype(compute_dtype).reshape(bsz, h * w, c)
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 else None)
    out = jax.lax.dot_general(
        w2.reshape(bsz, n * p * p, h * w), f,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=precision)
    return out.reshape(bsz, n, p, p, c).astype(compute_dtype)
