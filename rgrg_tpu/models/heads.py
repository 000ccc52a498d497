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


class TwoMLPHead(nn.Module):
    """fc6/fc7 of the Fast R-CNN box head.

    Input is NHWC-pooled [N, P, P, C]; the checkpoint converter permutes
    torch's channel-major fc6 weights to our spatial-major flatten order.
    """

    representation_size: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray) -> jnp.ndarray:
        x = pooled.reshape(pooled.shape[:-3] + (-1,))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             name="fc6")(x))
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
