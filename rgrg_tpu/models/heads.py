"""Detection heads: RPN head, TwoMLP box head, Fast R-CNN predictor,
region-feature reduction, and the two binary-classifier MLPs.

Weight-compatible with the reference modules (torchvision RPNHead/TwoMLPHead/
FastRCNNPredictor at object_detector.py:83,111-112; dim_reduction at
custom_roi_heads.py:61; classifier MLPs at binary_classifier_*.py:11-17).
The classifier heads are fused into the detector forward rather than being
separate modules called per stage — one jitted graph end to end.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class RPNHead(nn.Module):
    """3x3 conv + relu, then 1x1 objectness / box-delta convs.

    Outputs stay NHWC; flattening (y, x, anchor) matches the anchor grid
    ordering in rgrg_tpu.ops.anchors.
    """

    in_channels: int = 2048
    num_anchors: int = 160
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray):
        t = nn.Conv(self.in_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv")(feats)
        t = nn.relu(t)
        objectness = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                             name="cls_logits")(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                         name="bbox_pred")(t)
        b = feats.shape[0]
        # [B, H, W, A] -> [B, H*W*A]; [B, H, W, A*4] -> [B, H*W*A, 4]
        objectness = objectness.reshape(b, -1)
        deltas = deltas.reshape(b, -1, 4)
        return objectness, deltas


class _Fc6(nn.Module):
    """fc6 as a MULTI-AXIS contraction over the pooled (P, P, C) dims.

    The param tree is the flattened [P*P*C, rep] kernel (checkpoint/converter
    compatible, spatial-major order); the forward reshapes the KERNEL to
    [P, P, C, rep] and contracts the pooled map's trailing three axes with
    one dot_general. Flattening the ACTIVATION instead
    (pooled.reshape(..., -1) + Dense) forces a physical relayout of the
    [B, chunk, P, P, C] pooled tensor on TPU — the tiled (8,128) layout of
    the split dims does not bitcast to the merged dim's tiling — measured
    9.5 ms per 256-proposal chunk at B=24 (~26% of the whole detect pass);
    relayouting the weight once instead is ~0.3 ms, CSE'd across chunks.
    """

    representation_size: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        p1, p2, c = pooled.shape[-3:]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (p1 * p2 * c, self.representation_size), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.representation_size,), jnp.float32)
        k4 = kernel.astype(self.dtype).reshape(
            (p1, p2, c, self.representation_size))
        nb = pooled.ndim - 3
        y = jax.lax.dot_general(
            pooled.astype(self.dtype), k4,
            (((nb, nb + 1, nb + 2), (0, 1, 2)), ((), ())))
        return y + bias.astype(self.dtype)


class TwoMLPHead(nn.Module):
    """fc6/fc7 of the Fast R-CNN box head.

    Input is NHWC-pooled [N, P, P, C]; the checkpoint converter permutes
    torch's channel-major fc6 weights to our spatial-major flatten order
    (the fc6 kernel param stays [P*P*C, rep] — see _Fc6 for why the
    contraction runs un-flattened).
    """

    representation_size: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(_Fc6(self.representation_size, dtype=self.dtype,
                         name="fc6")(pooled))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             name="fc7")(x))
        return x


class FastRCNNPredictor(nn.Module):
    num_classes: int = 30
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        cls = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_score")(x)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        return cls, reg


class BinaryClassifierMLP(nn.Module):
    """1024 -> 512 -> 128 -> 1 with ReLU; used for both region selection and
    region abnormality."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(512, name="fc0")(x))
        x = nn.relu(nn.Dense(128, name="fc1")(x))
        return nn.Dense(1, name="fc2")(x)[..., 0]
