"""SCDA region mining: cluster RPN proposals into K instance groups.

Rebuild of the fork's "where to look" stage (SURVEY.md §3.2, CVPR'19 §3.2):
take the top-N RPN proposals, k-means their centres into K groups, and
form one region box per group — the union (tight bounding box) of the
member proposals — weighted by how many proposals landed in the group
("how to align").

The reference runs sklearn k-means on CPU every step (a host sync); here
it is the on-device fixed-iteration k-means of
:mod:`scda_tpu.core.kmeans`, so mining stays inside the jitted step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scda_tpu.config import AdaptConfig
from scda_tpu.core.kmeans import kmeans


class MinedRegions(NamedTuple):
    boxes: jnp.ndarray    # (B, K, 4) union box per group
    weights: jnp.ndarray  # (B, K) proposal-count weights, sum to 1 per image
    valid: jnp.ndarray    # (B, K) bool (non-empty groups)


def mine_regions(
    prop_boxes: jnp.ndarray,  # (B, N, 4), sorted by score (NMS keep order)
    prop_valid: jnp.ndarray,  # (B, N)
    cfg: AdaptConfig,
    key: jax.Array,
) -> MinedRegions:
    b = prop_boxes.shape[0]
    top_n = min(cfg.mining_top_n, prop_boxes.shape[1])
    keys = jax.random.split(key, b)

    def one_image(boxes_i, valid_i, key_i):
        boxes = boxes_i[:top_n]
        mask = valid_i[:top_n]
        centers = jnp.stack(
            [
                0.5 * (boxes[:, 0] + boxes[:, 2]),
                0.5 * (boxes[:, 1] + boxes[:, 3]),
            ],
            axis=1,
        )
        _, assign, counts = kmeans(
            centers, cfg.num_groups, mask=mask, iters=cfg.kmeans_iters,
            key=key_i, init=cfg.kmeans_init,
        )
        onehot = (
            jax.nn.one_hot(assign, cfg.num_groups, dtype=jnp.float32)
            * mask[:, None].astype(jnp.float32)
        )  # (N, K)
        member = onehot.T[..., None] > 0  # (K, N, 1)

        big = jnp.float32(1e9)
        x1 = jnp.min(jnp.where(member[..., 0], boxes[None, :, 0], big), axis=1)
        y1 = jnp.min(jnp.where(member[..., 0], boxes[None, :, 1], big), axis=1)
        x2 = jnp.max(jnp.where(member[..., 0], boxes[None, :, 2], -big), axis=1)
        y2 = jnp.max(jnp.where(member[..., 0], boxes[None, :, 3], -big), axis=1)
        group_boxes = jnp.stack([x1, y1, x2, y2], axis=1)

        valid = counts > 0
        group_boxes = jnp.where(valid[:, None], group_boxes, 0.0)
        weights = counts.astype(jnp.float32)
        weights = weights / jnp.maximum(jnp.sum(weights), 1.0)
        return group_boxes, weights, valid

    gb, wt, gv = jax.vmap(one_image)(prop_boxes, prop_valid, keys)
    return MinedRegions(boxes=gb, weights=wt, valid=gv)
