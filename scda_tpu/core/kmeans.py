"""On-device k-means for SCDA region mining.

The reference clusters RPN proposal centres with CPU k-means every train
step (SURVEY.md §3.2 — "k-means runs on CPU per step ... a host sync
point").  On TPU that host round-trip would stall the whole step, so this
is a fixed-iteration Lloyd's algorithm inside jit: a ``lax.fori_loop``
over a handful of iterations on at most a few hundred points.  Shapes are
static; invalid points are masked out of the assignment and the update.

Initialisation is deterministic (quantile-spread over the valid points in
a Hilbert-ish score order) so training is reproducible under jit — the
reference's sklearn ``k-means++`` randomness is replaced by seeding from
the provided rng key when ``key`` is given.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _init_centers(points, mask, k, key):
    """Pick K initial centres among valid points: random valid points if a
    key is given, else evenly strided valid points."""
    n = points.shape[0]
    order = jnp.argsort(~mask)  # valid points first, stable
    num_valid = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    if key is not None:
        u = jax.random.uniform(key, (k,))
        pick = (u * num_valid).astype(jnp.int32)
    else:
        pick = (
            (jnp.arange(k, dtype=jnp.float32) + 0.5) / k * num_valid
        ).astype(jnp.int32)
    pick = jnp.clip(pick, 0, n - 1)
    return jnp.take(points, jnp.take(order, pick), axis=0)


def kmeans(
    points: jnp.ndarray,
    k: int,
    *,
    mask: jnp.ndarray | None = None,
    iters: int = 10,
    key: jax.Array | None = None,
):
    """Lloyd's k-means with static shapes.

    Args:
      points: (N, D) float.
      k: number of clusters (static).
      mask: optional (N,) bool validity; invalid points get assignment -1
        in spirit (they are assigned to cluster 0 but excluded from counts
        and updates; callers should gate on ``mask``).
      iters: fixed iteration count (static).
      key: optional PRNG key for random init.

    Returns:
      centers (K, D), assign (N,) int32, counts (K,) int32 of valid
      members per cluster.
    """
    points = points.astype(jnp.float32)
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    fmask = mask.astype(jnp.float32)

    centers0 = _init_centers(points, mask, k, key)

    def assign_to(centers):
        d2 = jnp.sum(
            (points[:, None, :] - centers[None, :, :]) ** 2, axis=-1
        )  # (N, K)
        return jnp.argmin(d2, axis=1).astype(jnp.int32)

    def body(_, centers):
        assign = assign_to(centers)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32) * fmask[:, None]
        counts = jnp.sum(onehot, axis=0)  # (K,)
        sums = onehot.T @ points  # (K, D) — MXU-friendly
        new_centers = sums / jnp.maximum(counts[:, None], 1.0)
        # Keep empty clusters where they were.
        return jnp.where(counts[:, None] > 0, new_centers, centers)

    centers = lax.fori_loop(0, iters, body, centers0)
    assign = assign_to(centers)
    onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32) * fmask[:, None]
    counts = jnp.sum(onehot, axis=0).astype(jnp.int32)
    return centers, assign, counts
