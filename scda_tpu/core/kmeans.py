"""On-device k-means for SCDA region mining.

The reference clusters RPN proposal centres with CPU k-means every train
step (SURVEY.md §3.2 — "k-means runs on CPU per step ... a host sync
point").  On TPU that host round-trip would stall the whole step, so this
is a fixed-iteration Lloyd's algorithm inside jit: a ``lax.fori_loop``
over a handful of iterations on at most a few hundred points.  Shapes are
static; invalid points are masked out of the assignment and the update.

Initialisation is k-means++-style (each centre drawn ∝ squared distance
to the nearest already-chosen centre — the same policy as the reference's
sklearn default), sampled via the Gumbel-max trick when ``key`` is given
and greedy farthest-point when deterministic.  Either way a centre cannot
repeat an already-chosen point while distinct valid points remain, so
K=9 over a few hundred proposal centres cannot start with duplicate
centres and freeze empty clusters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _init_centers_spread(points, mask, k, key):
    """Legacy quantile-spread init (the pre-r4 default, kept selectable
    for A/B counterfactuals): K random valid points when ``key`` is
    given, else evenly strided valid points in stable order.  Unlike
    ``++`` this can pick near-duplicate centres on clustered inputs
    (measured 30% empty-cluster scenes, scripts/kmeans_init_ab.py)."""
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


def _init_centers(points, mask, k, key):
    """k-means++-style spread init over valid points.

    First centre: a uniform-random valid point (``key`` given) or the
    first valid point.  Each subsequent centre is drawn with probability
    proportional to its squared distance to the nearest chosen centre
    (Gumbel-max sampling), or greedily farthest when deterministic.
    Already-chosen points have weight zero, so duplicates only occur when
    there are fewer distinct valid points than K (then any valid point is
    reused — unavoidable).
    """
    n = points.shape[0]
    neg_inf = jnp.float32(-jnp.inf)
    if key is not None:
        k0, k1 = jax.random.split(key)
        g0 = jax.random.gumbel(k0, (n,))
        first = jnp.argmax(jnp.where(mask, g0, neg_inf))
        gs = jax.random.gumbel(k1, (max(k - 1, 0), n))
    else:
        first = jnp.argmax(mask)
        gs = jnp.zeros((max(k - 1, 0), n), jnp.float32)
    c0 = points[first]
    mind2_0 = jnp.sum((points - c0[None, :]) ** 2, axis=-1)

    def step(mind2, g):
        w = jnp.where(mask, mind2, 0.0)
        score = jnp.where(w > 0, jnp.log(jnp.maximum(w, 1e-30)) + g,
                          neg_inf)
        # If no point has positive weight (fewer distinct valid points
        # than K), fall back to any valid point to keep indices in range.
        idx = jnp.where(jnp.any(w > 0), jnp.argmax(score),
                        jnp.argmax(jnp.where(mask, g, neg_inf)))
        c = points[idx]
        mind2 = jnp.minimum(mind2, jnp.sum((points - c[None, :]) ** 2,
                                           axis=-1))
        return mind2, c

    _, rest = lax.scan(step, mind2_0, gs)
    return jnp.concatenate([c0[None, :], rest], axis=0)


def kmeans(
    points: jnp.ndarray,
    k: int,
    *,
    mask: jnp.ndarray | None = None,
    iters: int = 10,
    key: jax.Array | None = None,
    init: str = "++",
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
      init: "++" (k-means++-style D² spread, default) or "spread" (legacy
        quantile-strided init, selectable for counterfactual A/Bs).

    Returns:
      centers (K, D), assign (N,) int32, counts (K,) int32 of valid
      members per cluster.
    """
    points = points.astype(jnp.float32)
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    fmask = mask.astype(jnp.float32)

    if init == "++":
        centers0 = _init_centers(points, mask, k, key)
    elif init == "spread":
        centers0 = _init_centers_spread(points, mask, k, key)
    else:
        raise ValueError(f"unknown kmeans init {init!r}")

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
