#!/usr/bin/env python
"""A/B: k-means++ init vs the pre-r4 grid init, on mining-shaped data.

The r4 change (core/kmeans.py) replaced the original deterministic grid
initialisation with k-means++-style spread init (the reference's sklearn
default — SURVEY.md §3.2).  r4 VERDICT asked for the change to be
justified by numbers, not just the no-empty-cluster tests.  This script
measures both inits on proposal-centre distributions shaped like the
ones region mining sees (clustered objects + background clutter inside a
fixed canvas), on CPU, and prints a compact table:

  * within-cluster SSE after the production iteration budget (lower is
    better — tighter groups ⇒ region patches cover one object each);
  * empty-cluster rate (an empty cluster wastes one of the K=9 aligned
    patches and skews the count-weighted adversarial loss);
  * SSE after 0 Lloyd iterations (pure init quality).

Grid init is reimplemented here exactly as it was before r4: K centres
on a ceil(sqrt(K))-grid over the bounding box of the valid points.

Usage: python scripts/kmeans_init_ab.py [--trials 200]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

# Force, don't setdefault: the machine env pins JAX_PLATFORMS=axon (the
# tunneled TPU) and this comparison must not contend for the chip.
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scda_tpu.core import kmeans as km


def grid_init(points, mask, k):
    """The pre-r4 init: K centres on a regular grid over the valid bbox."""
    big = jnp.float32(1e9)
    p = jnp.where(mask[:, None], points, big)
    lo = jnp.min(p, axis=0)
    p = jnp.where(mask[:, None], points, -big)
    hi = jnp.max(p, axis=0)
    side = int(math.ceil(math.sqrt(k)))
    xs = jnp.linspace(lo[0], hi[0], side)
    ys = jnp.linspace(lo[1], hi[1], side)
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    grid = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)[:k]
    return grid


def lloyd(points, mask, centers0, iters):
    """Same Lloyd loop as core.kmeans, parameterised by init."""
    fmask = mask.astype(jnp.float32)
    k = centers0.shape[0]

    def assign_to(c):
        d2 = jnp.sum((points[:, None, :] - c[None, :, :]) ** 2, axis=-1)
        return jnp.argmin(d2, axis=1)

    c = centers0
    for _ in range(iters):
        a = assign_to(c)
        oh = jax.nn.one_hot(a, k) * fmask[:, None]
        cnt = oh.sum(0)
        c = jnp.where(cnt[:, None] > 0,
                      (oh.T @ points) / jnp.maximum(cnt[:, None], 1.0), c)
    a = assign_to(c)
    oh = jax.nn.one_hot(a, k) * fmask[:, None]
    cnt = oh.sum(0)
    d2 = jnp.sum((points - c[a]) ** 2, axis=-1) * fmask
    return float(d2.sum()), int((cnt == 0).sum())


def sample_scene(rng, n=256, canvas=(1024.0, 512.0)):
    """Proposal centres: a few gaussian object clusters + uniform clutter."""
    n_obj = rng.integers(3, 10)
    pts = []
    for _ in range(n_obj):
        c = rng.uniform([0, 0], canvas)
        s = rng.uniform(15.0, 60.0)
        m = rng.integers(10, 40)
        pts.append(rng.normal(c, s, size=(m, 2)))
    pts.append(rng.uniform([0, 0], canvas, size=(max(0, n - sum(len(p) for p in pts)), 2)))
    pts = np.clip(np.concatenate(pts)[:n], 0, canvas)
    mask = np.ones(n, bool)
    # ragged valid counts, like masked top-N proposals
    mask[rng.integers(n // 2, n):] = False
    return jnp.asarray(pts, jnp.float32), jnp.asarray(mask)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--k", type=int, default=9)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    rows = {"grid": [], "pp": []}
    for t in range(args.trials):
        pts, mask = sample_scene(rng)
        key = jax.random.PRNGKey(t)
        inits = {
            "grid": grid_init(pts, mask, args.k),
            "pp": km._init_centers(pts, mask, args.k, key),
        }
        for name, c0 in inits.items():
            sse0, _ = lloyd(pts, mask, c0, 0)
            sse, empty = lloyd(pts, mask, c0, args.iters)
            rows[name].append((sse0, sse, empty))

    out = {}
    for name, r in rows.items():
        a = np.array(r)
        out[name] = {
            "sse_init_mean": float(a[:, 0].mean()),
            "sse_final_mean": float(a[:, 1].mean()),
            "sse_final_p90": float(np.percentile(a[:, 1], 90)),
            "empty_cluster_rate": float((a[:, 2] > 0).mean()),
            "mean_empty": float(a[:, 2].mean()),
        }
    out["final_sse_ratio_grid_over_pp"] = (
        out["grid"]["sse_final_mean"] / out["pp"]["sse_final_mean"])
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
