"""ResNet backbone (flax.linen), NHWC, XLA convolutions.

Replaces the reference's torchvision `resnet50` feature extractor
(object_detector.py:51-62): conv1 rewired to 1 gray channel, classification
head dropped, C5 output [B, 16, 16, 2048] for 512x512 inputs.

Structure and numerics match torchvision's ResNet-v1 exactly (bottleneck
with stride on the 3x3 conv, BN eps 1e-5, maxpool 3x3/2 pad 1), so converted
PyTorch checkpoints reproduce reference activations. Layout is NHWC — the
TPU-native choice; the checkpoint converter transposes weights.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 reduce -> 3x3 (stride here) -> 1x1 expand."""

    width: int
    stride: int = 1
    expansion: int = 4
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        out_ch = self.width * self.expansion

        identity = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = bn("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = bn("bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)

        if self.has_downsample:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)

        return nn.relu(y + identity)


class ResNetBackbone(nn.Module):
    """ResNet-v1 feature extractor up to C5 (no avgpool/fc).

    stage_sizes (3, 4, 6, 3) == ResNet-50. in_channels=1 for grayscale CXR.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    in_channels: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: [B, H, W, in_channels] -> [B, H/32, W/32, 2048]."""
        assert x.shape[-1] == self.in_channels, (
            f"expected NHWC input with {self.in_channels} channels, got {x.shape}")
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        # maxpool 3x3 stride 2 pad 1; -inf padding like torch
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        width = 64
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                has_ds = block == 0  # stage 0 block 0 downsamples channels (64->256)
                y = Bottleneck(width=width, stride=stride, has_downsample=has_ds,
                               dtype=self.dtype,
                               name=f"layer{stage + 1}_{block}")(y, train=train)
            width *= 2
        return y
