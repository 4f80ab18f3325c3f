"""Training-target assignment: anchor targets (RPN) and proposal targets
(RCNN head), as pure shape-static functions under jit.

Rebuild of:
  - ref lib/model/rpn/anchor_target_layer.py (~170 LoC)
  - ref lib/model/rpn/proposal_target_layer_cascade.py (~220 LoC)

The reference's random *subset* sampling (``torch.randperm`` on dynamic
index lists) becomes masked random ranking: draw one uniform per
candidate, rank candidates of each class by that draw, keep ranks below
the quota.  Same distribution, fully static shapes, reproducible from the
step's PRNG key.  "Sampling with replacement" (when backgrounds run
short) becomes modulo-indexing into the randomly-ordered candidate list.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scda_tpu.config import ROITargetConfig, RPNTargetConfig
from scda_tpu.core import boxes as box_ops


def _masked_rank(key: jax.Array, mask: jnp.ndarray):
    """Random rank among masked elements.

    Returns (rank, order): ``rank[i] < count`` iff ``mask[i]``; ranks are a
    uniformly random permutation of the masked elements.  ``order`` lists
    masked element indices first, in rank order (for gather-with-
    replacement).
    """
    n = mask.shape[0]
    r = jax.random.uniform(key, (n,))
    score = jnp.where(mask, r, 2.0)
    order = jnp.argsort(score)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return rank, order


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray           # (B, K) int32 in {-1, 0, 1}
    bbox_targets: jnp.ndarray     # (B, K, 4)
    bbox_inside_w: jnp.ndarray    # (B, K, 4)
    bbox_outside_w: jnp.ndarray   # (B, K, 4)


def anchor_targets(
    anchors: jnp.ndarray,     # (K, 4)
    gt_boxes: jnp.ndarray,    # (B, G, 5)
    num_boxes: jnp.ndarray,   # (B,)
    im_info: jnp.ndarray,     # (B, 3)
    cfg: RPNTargetConfig,
    key: jax.Array,
) -> AnchorTargets:
    """Label anchors for RPN training (ref anchor_target_layer.py:~50-160).

    Per image: anchors fully inside the valid image extent participate;
    positives are (a) the best anchor(s) per gt and (b) anchors with
    IoU >= positive_overlap; negatives have IoU <= negative_overlap;
    positives are subsampled to ``batch_size * fg_fraction`` and negatives
    fill the rest, everything else is ignore (-1).
    """
    b = gt_boxes.shape[0]
    keys = jax.random.split(key, b)

    def one_image(gt_i, num_i, info_i, key_i):
        k = anchors.shape[0]
        g = gt_i.shape[0]
        gt_valid = jnp.arange(g) < num_i

        inside = (
            (anchors[:, 0] >= 0)
            & (anchors[:, 1] >= 0)
            & (anchors[:, 2] < info_i[1])
            & (anchors[:, 3] < info_i[0])
        )

        overlaps = box_ops.bbox_overlaps(anchors, gt_i[:, :4])
        overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)

        max_overlap = jnp.max(overlaps, axis=1)
        argmax_gt = jnp.argmax(overlaps, axis=1)
        # Best anchor(s) per gt, ties included (ref keeps all anchors
        # matching the per-gt max).
        gt_max = jnp.max(jnp.where(inside[:, None], overlaps, -2.0), axis=0)
        is_best_for_gt = jnp.any(
            (overlaps >= gt_max[None, :] - 1e-5) & gt_valid[None, :]
            & (gt_max[None, :] > 0), axis=1
        )

        labels = jnp.full((k,), -1, jnp.int32)
        neg = max_overlap < cfg.negative_overlap
        pos = is_best_for_gt | (max_overlap >= cfg.positive_overlap)
        if not cfg.clobber_positives:
            labels = jnp.where(inside & neg, 0, labels)
            labels = jnp.where(inside & pos, 1, labels)
        else:
            labels = jnp.where(inside & pos, 1, labels)
            labels = jnp.where(inside & neg, 0, labels)

        # Subsample (ref anchor_target_layer.py:~100).
        kf, kb = jax.random.split(key_i)
        num_fg_quota = int(cfg.fg_fraction * cfg.batch_size)
        fg_mask = labels == 1
        fg_rank, _ = _masked_rank(kf, fg_mask)
        labels = jnp.where(fg_mask & (fg_rank >= num_fg_quota), -1, labels)

        num_fg = jnp.sum((labels == 1).astype(jnp.int32))
        num_bg_quota = cfg.batch_size - num_fg
        bg_mask = labels == 0
        bg_rank, _ = _masked_rank(kb, bg_mask)
        labels = jnp.where(bg_mask & (bg_rank >= num_bg_quota), -1, labels)

        # Regression targets vs the assigned gt (used only where label==1).
        matched_gt = jnp.take(gt_i[:, :4], argmax_gt, axis=0)
        targets = box_ops.bbox_transform(anchors, matched_gt)

        inside_w = jnp.where((labels == 1)[:, None], 1.0, 0.0) * jnp.ones(
            (1, 4), jnp.float32
        )
        num_examples = jnp.maximum(
            jnp.sum((labels >= 0).astype(jnp.float32)), 1.0
        )
        if cfg.positive_weight < 0:
            pos_w = 1.0 / num_examples
            neg_w = 1.0 / num_examples
        else:
            pw = cfg.positive_weight
            pos_w = pw / jnp.maximum(
                jnp.sum((labels == 1).astype(jnp.float32)), 1.0
            )
            neg_w = (1.0 - pw) / jnp.maximum(
                jnp.sum((labels == 0).astype(jnp.float32)), 1.0
            )
        outside_w = (
            jnp.where((labels == 1)[:, None], pos_w, 0.0)
            + jnp.where((labels == 0)[:, None], neg_w, 0.0)
        ) * jnp.ones((1, 4), jnp.float32)

        return labels, targets, inside_w, outside_w

    lab, tgt, iw, ow = jax.vmap(one_image)(gt_boxes, num_boxes, im_info, keys)
    return AnchorTargets(lab, tgt, iw, ow)


class RoiSamples(NamedTuple):
    rois: jnp.ndarray           # (B, S, 4)
    labels: jnp.ndarray         # (B, S) int32, 0 = background
    bbox_targets: jnp.ndarray   # (B, S, 4) normalized encode vs matched gt
    bbox_inside_w: jnp.ndarray  # (B, S, 4)
    fg_mask: jnp.ndarray        # (B, S) bool


def proposal_targets(
    proposals: jnp.ndarray,    # (B, N, 4)
    prop_valid: jnp.ndarray,   # (B, N) bool
    gt_boxes: jnp.ndarray,     # (B, G, 5)
    num_boxes: jnp.ndarray,    # (B,)
    cfg: ROITargetConfig,
    key: jax.Array,
) -> RoiSamples:
    """Sample S rois per image for the RCNN head
    (ref proposal_target_layer_cascade.py:~60-200).

    Gt boxes are appended to the candidate set (as the reference does), a
    fixed quota of foregrounds (IoU >= fg_thresh) is drawn, backgrounds
    ([bg_thresh_lo, bg_thresh_hi)) fill the rest with replacement.
    """
    b, n, _ = proposals.shape
    g = gt_boxes.shape[1]
    s = cfg.batch_size
    fg_quota = int(round(cfg.fg_fraction * s))
    means = jnp.asarray(cfg.bbox_normalize_means, jnp.float32)
    stds = jnp.asarray(cfg.bbox_normalize_stds, jnp.float32)
    keys = jax.random.split(key, b)

    def one_image(props_i, pvalid_i, gt_i, num_i, key_i):
        gt_valid = jnp.arange(g) < num_i
        cand = jnp.concatenate([props_i, gt_i[:, :4]], axis=0)  # (N+G, 4)
        cvalid = jnp.concatenate([pvalid_i, gt_valid], axis=0)

        overlaps = box_ops.bbox_overlaps(cand, gt_i[:, :4])
        overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
        max_ov = jnp.max(overlaps, axis=1)
        arg_gt = jnp.argmax(overlaps, axis=1)

        fg = cvalid & (max_ov >= cfg.fg_thresh)
        bg = (
            cvalid
            & (max_ov < cfg.bg_thresh_hi)
            & (max_ov >= cfg.bg_thresh_lo)
        )

        fg_count = jnp.sum(fg.astype(jnp.int32))
        bg_count = jnp.sum(bg.astype(jnp.int32))

        kf, kb = jax.random.split(key_i)
        _, fg_order = _masked_rank(kf, fg)
        _, bg_order = _masked_rank(kb, bg)

        # Quotas per the reference's three cases (fg&bg / fg-only / bg-only).
        n_fg = jnp.where(
            bg_count > 0, jnp.minimum(fg_quota, fg_count), s
        )
        n_fg = jnp.where(fg_count > 0, n_fg, 0)

        slots = jnp.arange(s, dtype=jnp.int32)
        take_fg = slots < n_fg
        fg_pick = jnp.take(fg_order, slots % jnp.maximum(fg_count, 1))
        bg_pick = jnp.take(
            bg_order, (slots - n_fg) % jnp.maximum(bg_count, 1)
        )
        pick = jnp.where(take_fg, fg_pick, bg_pick)
        # Rows beyond every candidate (no fg and no bg at all) -> dead
        # slot: point at candidate 0 with label forced to bg.
        any_cand = (fg_count + bg_count) > 0

        rois = jnp.take(cand, pick, axis=0)
        matched_gt = jnp.take(gt_i, jnp.take(arg_gt, pick), axis=0)
        labels = jnp.where(
            take_fg, matched_gt[:, 4].astype(jnp.int32), 0
        )
        labels = jnp.where(any_cand, labels, 0)

        targets = box_ops.bbox_transform(rois, matched_gt[:, :4])
        targets = (targets - means[None, :]) / stds[None, :]
        inside_w = jnp.where(
            take_fg[:, None],
            jnp.asarray(cfg.bbox_inside_weights, jnp.float32)[None, :],
            0.0,
        )
        return rois, labels, targets, inside_w, take_fg

    rois, labels, tgt, iw, fgm = jax.vmap(one_image)(
        proposals, prop_valid, gt_boxes, num_boxes, keys
    )
    return RoiSamples(rois, labels, tgt, iw, fgm)
