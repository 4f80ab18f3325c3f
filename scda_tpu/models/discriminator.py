"""SCDA patch discriminator (``netD``).

Rebuild of the fork's region-level domain discriminator (SURVEY.md §2b
"SCDA: patch discriminator", ~60 LoC): a small conv stack over pooled
region patches producing one domain logit per patch.  The detector side
receives its adversarial gradient through the gradient-reversal layer
applied to the discriminator *input* (see scda_tpu.adapt.scda), so a
single cross-entropy objective trains both sides.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class PatchDiscriminator(nn.Module):
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        """patches (R, P, P, C) -> domain logits (R,)."""
        x = patches.astype(self.dtype)
        x = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv2")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(x)
        x = nn.leaky_relu(x, 0.2)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc")(x)
        return x[..., 0].astype(jnp.float32)
