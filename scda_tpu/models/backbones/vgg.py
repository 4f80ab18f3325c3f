"""VGG16 backbone + head, Flax/NHWC.

Rebuild of ref lib/model/faster_rcnn/vgg16.py (~110 LoC): torchvision
VGG16 conv1_1..conv5_3 as the base (stride 16, 512 channels; final maxpool
dropped), fc6/fc7 (4096) as the per-RoI head.  Differences by design:

  * NHWC layout and bf16 compute (MXU-native) with f32 params.
  * conv1/conv2 freezing is realised by the optimizer trainable-mask
    (:func:`frozen_param_mask`), not by flipping requires_grad — the
    jitted step stays purely functional.
  * Caffe-pretrained weights drop in via
    scda_tpu.train.torch_convert; layer names here deliberately match the
    torchvision ``features.N`` indexing to make that converter trivial.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torchvision VGG16 "features" layout: (torch layer index, channels) for
# convs; "M" for maxpools.  Ref vgg16.py uses features[:-1] (no final pool).
VGG16_LAYOUT = (
    (0, 64), (2, 64), "M",
    (5, 128), (7, 128), "M",
    (10, 256), (12, 256), (14, 256), "M",
    (17, 512), (19, 512), (21, 512), "M",
    (24, 512), (26, 512), (28, 512),
)

# Torch indices belonging to conv1+conv2 (frozen in the reference,
# vgg16.py:~50: "Fix the layers before conv3").
_FROZEN_TORCH_IDX = (0, 2, 5, 7)


@jax.custom_vjp
def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool: reduce_window forward, equality backward.

    Hybrid of the two formulations, taking each one's fast direction
    (both measured on-chip, RESULTS.md):
      * FORWARD uses ``nn.max_pool`` (``lax.reduce_window``) — the fused
        window op.  Expressing the forward as reshape+max instead costs
        inference 152 vs 173 img/s: the 6-D reshape is a relayout of the
        full-res activation.
      * BACKWARD is a custom vjp doing the reshape-max gradient — an
        elementwise equality-select at full res — instead of the
        ``select_and_scatter`` that reduce_window's autodiff lowers to
        (~1.8 ms/step on the 512x1024x64 conv1 activation alone, r1
        profile).  Ties split the cotangent evenly among maximal
        elements (vs first-match for select_and_scatter) — measure-zero
        for float activations.

    Requires even H/W (guaranteed: the canvas is /16).
    """
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _max_pool_2x2_fwd(x):
    y = nn.max_pool(x, (2, 2), strides=(2, 2))
    return y, (x, y)


def _max_pool_2x2_bwd(res, g):
    x, y = res
    b, h, w, c = x.shape
    xw = x.reshape(b, h // 2, 2, w // 2, 2, c)
    is_max = (xw == y[:, :, None, :, None, :]).astype(g.dtype)
    ties = jnp.sum(is_max, axis=(2, 4), keepdims=True)
    dx = is_max * (g[:, :, None, :, None, :] / ties)
    return (dx.reshape(b, h, w, c),)


max_pool_2x2.defvjp(_max_pool_2x2_fwd, _max_pool_2x2_bwd)


class StemConv3x3(nn.Module):
    """First conv (C_in=3) as a stacked-27 matmul instead of lax.conv.

    XLA's TPU conv lowering is pathological for a 3-channel full-res
    input: measured 2.36 ms standalone for conv1_1 at 512x1024 —
    1.8 GFLOP at <1% MFU, ~38% of the whole VGG16 backbone (r3
    block-level attribution).  Concatenating the 9 shifted taps on the
    channel axis and contracting (H*W, 27) x (27, 64) in ONE einsum is
    3x faster standalone (0.81 ms) because the MXU sees a single dense
    matmul instead of a degenerate-C_in convolution.

    Parameters are named/shaped exactly like ``nn.Conv`` (kernel
    (3, 3, 3, F), bias (F,)) so the torch converter and every
    checkpoint remain layout-identical.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        h, w = x.shape[1], x.shape[2]
        xb = x.astype(self.dtype)
        xpad = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [xpad[:, dy:dy + h, dx:dx + w, :]
             for dy in range(3) for dx in range(3)], axis=-1,
        )
        kb = kernel.reshape(9 * x.shape[-1], self.features).astype(
            self.dtype)
        out = jnp.einsum("bhwc,cf->bhwf", cols, kb,
                         preferred_element_type=jnp.float32)
        return (out + bias).astype(self.dtype)


class _Conv3x3Params(nn.Module):
    """Parameter-only twin of ``nn.Conv(features, (3, 3))`` — declares the
    identical {kernel, bias} tree (same names, shapes, init) so the fused
    Pallas stem can swap in without touching checkpoints/converters."""

    c_in: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.c_in, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return k, b


class VGG16Backbone(nn.Module):
    """conv1_1..conv5_3, stride 16, 512-channel output.

    ``return_pyramid=True`` additionally returns the stride-8 conv4_3
    feature (512 ch) for multi-scale RoI pooling (config #5); the flag
    only changes what is returned, never the parameter structure.

    ``stem_pallas=True`` (default) runs conv1_1+relu+conv1_2+relu+pool1
    through the fused Pallas kernel (ops/pallas/stem_kernel.py) when
    tracing for a TPU in bf16 on supported shapes — measured 23.3 ->
    9.4 ms standalone at bs=8 512x1024 (the XLA lowering spends ~10 ms
    on layout copies + patch concat of the 512 MB full-res activation).
    conv1/conv2 are frozen in every config (ref vgg16.py:~50), so the
    fused output is wrapped in stop_gradient — identical semantics to
    the frozen-grad DCE on the unfused path.  Parameter tree, converter
    and checkpoints are unchanged.
    """

    dtype: Any = jnp.bfloat16
    stem_pallas: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_pyramid: bool = False):
        from scda_tpu.ops.pallas import gate_backend_is_tpu, stem_kernel

        x = x.astype(self.dtype)
        f8 = None
        pools = 0
        layout = VGG16_LAYOUT
        if (
            self.stem_pallas
            and gate_backend_is_tpu()
            and self.dtype == jnp.bfloat16
            and stem_kernel.supported(x.shape[1], x.shape[2],
                                      x.shape[3], 64, 8)
        ):
            k1, b1 = _Conv3x3Params(x.shape[3], 64, name="conv0")()
            k2, b2 = _Conv3x3Params(64, 64, name="conv2")()
            # stop_gradient on the INPUTS: the kernel has no JVP rule,
            # and conv1/conv2 are frozen anyway — no tangent may enter.
            x, k1, b1, k2, b2 = jax.lax.stop_gradient(
                (x, k1, b1, k2, b2))
            x = stem_kernel.vgg_stem_fused(
                x, k1, b1, k2, b2, row_tile=8, dtype=self.dtype)
            pools = 1
            layout = VGG16_LAYOUT[3:]      # conv0, conv2, first M done
        for item in layout:
            if item == "M":
                if pools == 3:
                    f8 = x  # conv4_3 output, stride 8
                x = max_pool_2x2(x)
                pools += 1
            else:
                idx, ch = item
                if idx == 0:
                    # C_in=3 stem: stacked-matmul formulation (see
                    # StemConv3x3 — 3x the lax.conv lowering).
                    x = StemConv3x3(ch, dtype=self.dtype,
                                    name=f"conv{idx}")(x)
                else:
                    x = nn.Conv(
                        ch, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{idx}",
                    )(x)
                x = nn.relu(x)
        if return_pyramid:
            return f8, x
        return x


class VGG16Head(nn.Module):
    """fc6-fc7 per-RoI head (ref vgg16.py ``_head_to_tail``: the
    torchvision classifier minus the last fc, dropout included)."""

    dtype: Any = jnp.bfloat16
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # pooled: (R, P, P, C) -> flat in torch CHW order so fc6 weights
        # converted from torch keep their meaning.
        x = jnp.transpose(pooled, (0, 3, 1, 2)).reshape(pooled.shape[0], -1)
        x = x.astype(self.dtype)
        x = nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc6")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc7")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x

    @property
    def out_dim(self) -> int:
        return 4096


def vgg_frozen_param_paths() -> Sequence[str]:
    """Dot-path prefixes of params that stay frozen (ref vgg16.py:~50)."""
    return tuple(f"backbone/conv{i}" for i in _FROZEN_TORCH_IDX)
