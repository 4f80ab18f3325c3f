"""ResNet-50/101/152 backbone + C4 head, Flax/NHWC, frozen BatchNorm.

Rebuild of ref lib/model/faster_rcnn/resnet.py (~340 LoC): conv1..layer3
form the base (1024 channels, stride 16), layer4 is the per-RoI head with
global average pooling.  BatchNorm is *frozen* throughout — the reference
puts every BN in eval mode and stops its gradients (resnet.py:~290
``RESNET.FIXED_BLOCKS`` + eval-mode BN) — so here BN is a plain affine
transform with stored statistics (:class:`FrozenBatchNorm`), which is both
faithful and jit-trivial (no mutable batch stats in the train step).

Layer freezing (conv1 + ``fixed_blocks`` of layer1..3) is realised via the
optimizer trainable-mask, see :func:`resnet_frozen_param_paths`.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

RESNET_DEPTHS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """BN with constant statistics and affine params.

    Parameters are created so the torch converter can fill
    scale/bias/mean/var; none of them receive gradients (masked in the
    optimizer), matching the reference's always-eval BN.
    """

    features: int
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,),
                         jnp.float32)
        mult = (scale / jnp.sqrt(var + self.epsilon)).astype(self.dtype)
        add = (bias - mean * scale / jnp.sqrt(var + self.epsilon)).astype(
            self.dtype
        )
        return x.astype(self.dtype) * mult + add


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck, expansion 4 (torchvision layout:
    stride on the 3x3, 'B' downsample)."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda ch, k, s, name, pad=0: nn.Conv(
            ch, (k, k), strides=(s, s), padding=pad, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        residual = x
        out = conv(self.features, 1, 1, "conv1")(x)
        out = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.features, 3, self.stride, "conv2", pad=1)(out)
        out = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.features * 4, 1, 1, "conv3")(out)
        out = FrozenBatchNorm(self.features * 4, dtype=self.dtype,
                              name="bn3")(out)
        if self.downsample:
            residual = conv(self.features * 4, 1, self.stride,
                            "downsample_conv")(x)
            residual = FrozenBatchNorm(self.features * 4, dtype=self.dtype,
                                       name="downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNetStage(nn.Module):
    features: int
    blocks: int
    stride: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Bottleneck(self.features, stride=self.stride, downsample=True,
                       dtype=self.dtype, name="block0")(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.features, dtype=self.dtype,
                           name=f"block{i}")(x)
        return x


class ResNetBackbone(nn.Module):
    """conv1 .. layer3: stride 16, 1024-channel output (C4)."""

    depth: int = 101
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_pyramid: bool = False):
        blocks = RESNET_DEPTHS[self.depth]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, 2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResNetStage(64, blocks[0], 1, dtype=self.dtype, name="layer1")(x)
        x = ResNetStage(128, blocks[1], 2, dtype=self.dtype, name="layer2")(x)
        f8 = x  # layer2 output, stride 8 (512 ch)
        x = ResNetStage(256, blocks[2], 2, dtype=self.dtype, name="layer3")(x)
        if return_pyramid:
            return f8, x
        return x


class ResNetC4Head(nn.Module):
    """layer4 on pooled RoI features + global average pool
    (ref resnet.py ``_head_to_tail``: RCNN_top(pool5).mean(3).mean(2))."""

    depth: int = 101
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        blocks = RESNET_DEPTHS[self.depth]
        x = ResNetStage(512, blocks[3], 2, dtype=self.dtype,
                        name="layer4")(pooled.astype(self.dtype))
        return jnp.mean(x, axis=(1, 2))

    @property
    def out_dim(self) -> int:
        return 2048


def resnet_frozen_param_paths(fixed_blocks: int = 1) -> Sequence[str]:
    """Frozen prefixes: conv1/bn1 always; layer1..layerN per
    ``RESNET.FIXED_BLOCKS`` (ref resnet.py:~300).  All FrozenBatchNorm
    params are masked separately by name ('bn' in path)."""
    paths = ["backbone/conv1", "backbone/bn1"]
    for i in range(1, min(max(fixed_blocks, 0), 3) + 1):
        paths.append(f"backbone/layer{i}")
    return tuple(paths)
