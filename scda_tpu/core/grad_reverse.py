"""Gradient reversal layer (GRL).

TPU-native equivalent of the reference's autograd ``Function`` with
identity forward and ``-lambda * grad`` backward (SURVEY.md §2b "SCDA:
gradient reversal"; the fork folds it into the adversarial objective).
In JAX this is a two-line ``custom_vjp`` that composes with jit/vmap/pjit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def grad_reverse(x, scale: float = 1.0):
    """Identity forward; gradient multiplied by ``-scale`` on the way back."""
    return x


def _fwd(x, scale):
    return x, None


def _bwd(scale, _, g):
    return (jax.tree_util.tree_map(lambda t: -scale * t, g),)


grad_reverse.defvjp(_fwd, _bwd)


def scaled_gradient(x, scale: float):
    """Identity forward, gradient multiplied by ``scale`` (no flip).

    Useful for loss-weighting tricks without touching the loss value.
    """
    return grad_reverse(x, -scale)
