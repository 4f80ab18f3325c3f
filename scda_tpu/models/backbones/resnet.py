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

import jax
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


def _matmul_1x1(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                dtype) -> jnp.ndarray:
    """1x1 conv as one MXU contraction ((B*H*W, Cin) x (Cin, Cout));
    stride is a pre-slice (a strided pad-0 1x1 conv reads exactly the
    stride-grid positions)."""
    if stride > 1:
        x = x[:, ::stride, ::stride, :]
    return jax.lax.dot_general(
        x.astype(dtype), kernel[0, 0].astype(dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
    )


def _matmul_3x3(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                dtype) -> jnp.ndarray:
    """3x3 pad-1 conv as a stacked-tap contraction: concatenate the nine
    shifted (and strided) input views channel-wise and contract
    (B*Ho*Wo, 9*F) x (9*F, F) in ONE dense MXU matmul — the formulation
    that beat lax.conv 3x for the VGG stem (RESULTS.md).  At the RoI
    head's tiny spatial extents (7x7 -> 4x4, batch 300) the taps are
    cheap relabelings and the matmul is large and lane-aligned."""
    h, w = x.shape[1], x.shape[2]
    ho = (h + 2 - 3) // stride + 1
    wo = (w + 2 - 3) // stride + 1
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        xp[:, i:i + (ho - 1) * stride + 1:stride,
           j:j + (wo - 1) * stride + 1:stride, :]
        for i in range(3) for j in range(3)
    ]
    stacked = jnp.concatenate(taps, axis=-1)          # (B, Ho, Wo, 9F)
    f = kernel.shape[2]
    wk = kernel.reshape(9 * f, kernel.shape[3]).astype(dtype)
    return jax.lax.dot_general(
        stacked, wk, (((stacked.ndim - 1,), (0,)), ((), ())),
    )


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck, expansion 4 (torchvision layout:
    stride on the 3x3, 'B' downsample).

    ``matmul=True`` computes the same math as explicit MXU contractions
    (1x1s as (BHW, C) matmuls, the 3x3 as a stacked-9-tap matmul) with a
    parameter tree IDENTICAL to the nn.Conv path — used by the RoI head
    where lax.conv's lowering underutilizes the MXU at tiny spatial
    extents (see :class:`ResNetC4Head`)."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16
    matmul: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.matmul:
            return self._matmul_forward(x)
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

    def _matmul_forward(self, x: jnp.ndarray) -> jnp.ndarray:
        f, c = self.features, x.shape[-1]
        k1 = _ConvKernelParams((1, 1, c, f), name="conv1")()
        out = _matmul_1x1(x, k1, 1, self.dtype)
        out = FrozenBatchNorm(f, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        k2 = _ConvKernelParams((3, 3, f, f), name="conv2")()
        out = _matmul_3x3(out, k2, self.stride, self.dtype)
        out = FrozenBatchNorm(f, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        k3 = _ConvKernelParams((1, 1, f, 4 * f), name="conv3")()
        out = _matmul_1x1(out, k3, 1, self.dtype)
        out = FrozenBatchNorm(4 * f, dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            kd = _ConvKernelParams((1, 1, c, 4 * f),
                                   name="downsample_conv")()
            residual = _matmul_1x1(x, kd, self.stride, self.dtype)
            residual = FrozenBatchNorm(4 * f, dtype=self.dtype,
                                       name="downsample_bn")(residual)
        else:
            residual = x.astype(self.dtype)
        return nn.relu(out + residual)


class _ConvKernelParams(nn.Module):
    """Parameter-only twin of ``nn.Conv(..., use_bias=False)`` — declares
    the identical {kernel} tree (same name, shape, init) so the fused
    bottleneck chain can swap in without touching checkpoints/converters."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _BNParams(nn.Module):
    """Parameter-only twin of :class:`FrozenBatchNorm`."""

    features: int

    @nn.compact
    def __call__(self):
        f = self.features
        return {
            "scale": self.param("scale", nn.initializers.ones, (f,),
                                jnp.float32),
            "bias": self.param("bias", nn.initializers.zeros, (f,),
                               jnp.float32),
            "mean": self.param("mean", nn.initializers.zeros, (f,),
                               jnp.float32),
            "var": self.param("var", nn.initializers.ones, (f,),
                              jnp.float32),
        }


class _BottleneckParams(nn.Module):
    """Declares an identity Bottleneck's exact param tree without running
    it, returning the dict :func:`fold_bottleneck_params` expects."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        f, c = self.features, self.in_features
        return {
            "conv1": {"kernel": _ConvKernelParams((1, 1, c, f),
                                                  name="conv1")()},
            "bn1": _BNParams(f, name="bn1")(),
            "conv2": {"kernel": _ConvKernelParams((3, 3, f, f),
                                                  name="conv2")()},
            "bn2": _BNParams(f, name="bn2")(),
            "conv3": {"kernel": _ConvKernelParams((1, 1, f, 4 * f),
                                                  name="conv3")()},
            "bn3": _BNParams(4 * f, name="bn3")(),
        }


class ResNetStage(nn.Module):
    """block0 (strided, downsample) + N-1 identity bottlenecks.

    ``chain_pallas=True`` runs the identity tail through the fused
    VMEM-resident Pallas chain (ops/pallas/bottleneck_kernel.py) when
    tracing for a TPU in bf16 on supported shapes — at the production
    canvas only layer3 qualifies (its (32, 64, 1024) map fits VMEM; the
    stride-4/8 stages fall back to the per-block XLA path).  Parameter
    tree, converter and checkpoints are unchanged; gradients flow via
    the kernel's custom_vjp (backward remats through plain XLA ops)."""

    features: int
    blocks: int
    stride: int
    dtype: Any = jnp.bfloat16
    chain_pallas: bool = False
    matmul: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from scda_tpu.ops.pallas import bottleneck_kernel, gate_backend_is_tpu

        x = Bottleneck(self.features, stride=self.stride, downsample=True,
                       dtype=self.dtype, matmul=self.matmul,
                       name="block0")(x)
        if (
            self.chain_pallas
            and self.blocks > 1
            and gate_backend_is_tpu()
            and self.dtype == jnp.bfloat16
            and bottleneck_kernel.supported(
                x.shape[1], x.shape[2], 4 * self.features, self.features)
        ):
            blocks = [
                _BottleneckParams(self.features, 4 * self.features,
                                  name=f"block{i}")()
                for i in range(1, self.blocks)
            ]
            stacks = bottleneck_kernel.fold_bottleneck_params(blocks)
            return bottleneck_kernel.bottleneck_chain(
                x, *stacks, dtype=self.dtype)
        for i in range(1, self.blocks):
            x = Bottleneck(self.features, dtype=self.dtype,
                           matmul=self.matmul, name=f"block{i}")(x)
        return x


class ResNetBackbone(nn.Module):
    """conv1 .. layer3: stride 16, 1024-channel output (C4)."""

    depth: int = 101
    dtype: Any = jnp.bfloat16
    # Opt-in (mirrors config.bottleneck_pallas): the fused chain wins
    # standalone but loses fused end-to-end (scripts/bottleneck_ab.py,
    # 159.4 vs 196.0 img/s res101-ms serving).
    chain_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_pyramid: bool = False):
        blocks = RESNET_DEPTHS[self.depth]
        cp = self.chain_pallas
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, 2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResNetStage(64, blocks[0], 1, dtype=self.dtype,
                        chain_pallas=cp, name="layer1")(x)
        x = ResNetStage(128, blocks[1], 2, dtype=self.dtype,
                        chain_pallas=cp, name="layer2")(x)
        f8 = x  # layer2 output, stride 8 (512 ch)
        x = ResNetStage(256, blocks[2], 2, dtype=self.dtype,
                        chain_pallas=cp, name="layer3")(x)
        if return_pyramid:
            return f8, x
        return x


class ResNetC4Head(nn.Module):
    """layer4 on pooled RoI features + global average pool
    (ref resnet.py ``_head_to_tail``: RCNN_top(pool5).mean(3).mean(2)).

    ``matmul=True`` (cfg.model.head_matmul) computes every layer4 conv
    as explicit MXU contractions — at the head's shapes ((R=300, 7, 7,
    1024) -> (300, 4, 4, 2048)) each becomes one large lane-aligned
    matmul ((4800, 9*512) x (4608, 512) for the 3x3), where lax.conv's
    tiny-extent lowering measured ~39% of peak (RESULTS.md r4 ledger).
    Same parameter tree; pure-XLA, so it composes with the scheduler
    (the reformulation class that has WON fused here — stacked-27 stem,
    einsum RoI — where opaque Pallas calls lost)."""

    depth: int = 101
    dtype: Any = jnp.bfloat16
    matmul: bool = False

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        blocks = RESNET_DEPTHS[self.depth]
        x = ResNetStage(512, blocks[3], 2, dtype=self.dtype,
                        matmul=self.matmul,
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
