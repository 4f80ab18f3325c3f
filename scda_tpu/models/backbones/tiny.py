"""Tiny CNN backbone for tests and fast CPU smoke runs.

Not part of the reference inventory — it exists because the rebuild has a
real test suite (SURVEY.md §4 "Implication for the rebuild") and VGG16 is
too heavy for single-core CI.  Same contract as the real backbones:
stride 16, NHWC, returns (B, H/16, W/16, C).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class TinyBackbone(nn.Module):
    channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_pyramid: bool = False):
        x = x.astype(self.dtype)
        f8 = None
        for i, ch in enumerate([16, 32, 48, self.channels]):
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{i}")(x)
            x = nn.relu(x)
            from scda_tpu.models.backbones.vgg import max_pool_2x2

            x = max_pool_2x2(x)  # reshape-max: cheap backward (see vgg.py)
            if i == 2:
                f8 = x  # stride 8
        if return_pyramid:
            return f8, x
        return x


class TinyHead(nn.Module):
    features: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = pooled.reshape(pooled.shape[0], -1).astype(self.dtype)
        x = nn.Dense(self.features, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc")(x)
        return nn.relu(x)

    @property
    def out_dim(self) -> int:
        return self.features
