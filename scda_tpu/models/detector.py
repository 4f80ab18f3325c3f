"""Detection pipeline: training forward (losses) and inference
postprocessing, as pure jittable functions over a FasterRCNN model.

Rebuild of the pipeline wiring inside ref
lib/model/faster_rcnn/faster_rcnn.py:~60-160 (``_fasterRCNN.forward``)
and the test-time postprocess of ref test_net.py:~150-200.  The whole
train forward — backbone, RPN, target sampling, pooling, head, four
losses — is one traced function; there are no Python/device boundaries
(the reference crosses them at every custom op).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from scda_tpu.config import Config
from scda_tpu.core import boxes as box_ops
from scda_tpu.core.boxes import smooth_l1_loss
from scda_tpu.models.faster_rcnn import (
    FasterRCNN, pool_rois, pool_rois_multiscale,
)
from scda_tpu.models.rpn import Proposals, propose
from scda_tpu.models.targets import anchor_targets, proposal_targets
from scda_tpu.ops.nms import batched_nms


def _pool_ms(model, params, feat_fine, feat, rois, mc):
    """Multiscale pooling dispatch: with cfg.ms_proj_after_pool the
    lateral projection commutes to after pooling (a parameterized step,
    hence routed through the module); otherwise ``feat_fine`` arrives
    already projected and the pooling is parameter-free."""
    if mc.ms_proj_after_pool:
        return model.apply({"params": params}, feat_fine, feat, rois,
                           method=FasterRCNN.pool_multiscale)
    return pool_rois_multiscale(feat_fine, feat, rois, mc)


def make_anchors(cfg: Config, feat_hw: Tuple[int, int]) -> jnp.ndarray:
    """All anchors for the (static) feature map size — computed in numpy
    at trace time, a constant inside the jitted program."""
    base = box_ops.generate_base_anchors(
        cfg.anchors.base_size, cfg.anchors.ratios, cfg.anchors.scales
    )
    return jnp.asarray(
        box_ops.shift_anchors(base, feat_hw[0], feat_hw[1],
                              cfg.model.feat_stride)
    )


class TrainForward(NamedTuple):
    loss: jnp.ndarray
    metrics: Dict[str, jnp.ndarray]
    proposals: Proposals
    base_feat: jnp.ndarray


def _rpn_losses(cls_logits, bbox_pred, tgts):
    """RPN losses (ref rpn.py:~70): CE over sampled anchors + smooth-L1
    sigma=3 with 1/num_examples outside weights."""
    b = cls_logits.shape[0]
    logits = cls_logits.reshape(b, -1, 2)
    labels = tgts.labels  # (B, K) in {-1, 0, 1}

    logp = jax.nn.log_softmax(logits, axis=-1)
    # One-hot contraction, NOT take_along_axis: the gather's backward is
    # a scatter-add that XLA serializes into a per-row while loop (the
    # r1-profiled %while.64 family, ~2.7 ms/step); the one-hot product's
    # backward is a dense elementwise op.
    onehot = jax.nn.one_hot(jnp.maximum(labels, 0), 2, dtype=logp.dtype)
    picked = jnp.sum(logp * onehot, axis=-1)
    mask = (labels >= 0).astype(jnp.float32)
    cls_loss = -jnp.sum(picked * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    box_loss = smooth_l1_loss(
        bbox_pred.reshape(b, -1, 4),
        tgts.bbox_targets,
        tgts.bbox_inside_w,
        tgts.bbox_outside_w,
        sigma=3.0,
    ) / b
    return cls_loss, box_loss


def _rcnn_losses(cls_logits, bbox_deltas, samples, num_classes,
                 class_agnostic):
    """RCNN head losses (ref faster_rcnn.py:~120): CE over all sampled
    rois; smooth-L1 sigma=1 on the gt class' delta slice, mean over rois."""
    bs, s = samples.labels.shape
    logits = cls_logits.reshape(bs, s, -1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # One-hot contractions replace take_along_axis: the gathers'
    # backwards are scatter-adds that XLA lowers to serial while loops
    # (512 iterations for the delta slice — the profiled %while.64,
    # ~2.7 ms/step); one-hot products differentiate densely.
    onehot = jax.nn.one_hot(samples.labels, logp.shape[-1],
                            dtype=logp.dtype)              # (bs, s, K)
    cls_loss = -jnp.mean(jnp.sum(logp * onehot, axis=-1))

    if class_agnostic:
        deltas = bbox_deltas.reshape(bs, s, 4)
    else:
        deltas = bbox_deltas.reshape(bs, s, num_classes, 4)
        # (bs, s, K) x (bs, s, K, 4) -> (bs, s, 4)
        deltas = jnp.einsum("bsk,bskc->bsc", onehot, deltas)

    outside_w = (samples.bbox_inside_w > 0).astype(jnp.float32)
    box_loss = smooth_l1_loss(
        deltas, samples.bbox_targets, samples.bbox_inside_w, outside_w,
        sigma=1.0,
    ) / (bs * s)
    return cls_loss, box_loss


def forward_train(
    model: FasterRCNN,
    params,
    image: jnp.ndarray,      # (B, H, W, 3)
    im_info: jnp.ndarray,    # (B, 3)
    gt_boxes: jnp.ndarray,   # (B, G, 5)
    num_boxes: jnp.ndarray,  # (B,)
    cfg: Config,
    rng: jax.Array,
) -> TrainForward:
    """Full supervised training forward (ref trainval_net.py hot loop +
    _fasterRCNN.forward), producing total loss + per-loss metrics."""
    mc = cfg.model
    rng_anchor, rng_roi, rng_drop = jax.random.split(rng, 3)

    if mc.multiscale_roi:
        feat_fine, feat = model.apply(
            {"params": params}, image, method=FasterRCNN.features_pyramid
        )
    else:
        feat_fine = None
        feat = model.apply({"params": params}, image,
                           method=FasterRCNN.features)
    rpn_cls, rpn_bbox = model.apply(
        {"params": params}, feat, method=FasterRCNN.rpn_out
    )

    fh, fw = feat.shape[1], feat.shape[2]
    anchors = make_anchors(cfg, (fh, fw))

    props = propose(rpn_cls, rpn_bbox, anchors, im_info, cfg.train.proposal)

    a_tgts = anchor_targets(
        anchors, gt_boxes, num_boxes, im_info, cfg.train.rpn_target,
        rng_anchor,
    )
    rpn_cls_loss, rpn_box_loss = _rpn_losses(rpn_cls, rpn_bbox, a_tgts)

    samples = proposal_targets(
        props.boxes, props.valid, gt_boxes, num_boxes, cfg.train.roi_target,
        rng_roi,
    )

    bs, s = samples.labels.shape
    if mc.multiscale_roi:
        pooled = _pool_ms(model, params, feat_fine, feat, samples.rois, mc)
    else:
        pooled = pool_rois(feat, samples.rois, None, mc)  # grouped MXU

    cls_logits, bbox_deltas = model.apply(
        {"params": params}, pooled, True,
        method=FasterRCNN.roi_head, rngs={"dropout": rng_drop},
    )
    rcnn_cls_loss, rcnn_box_loss = _rcnn_losses(
        cls_logits, bbox_deltas, samples, mc.num_classes, mc.class_agnostic
    )

    total = rpn_cls_loss + rpn_box_loss + rcnn_cls_loss + rcnn_box_loss

    fg_cnt = jnp.sum(samples.fg_mask.astype(jnp.int32))
    metrics = {
        "loss": total,
        "rpn_cls": rpn_cls_loss,
        "rpn_box": rpn_box_loss,
        "rcnn_cls": rcnn_cls_loss,
        "rcnn_box": rcnn_box_loss,
        "fg_cnt": fg_cnt,
        "bg_cnt": bs * s - fg_cnt,
    }
    return TrainForward(total, metrics, props, feat)


class Detections(NamedTuple):
    """Fixed-size per-image detections (class ids are 1-based fg ids)."""

    boxes: jnp.ndarray    # (B, D, 4) in original image coords
    scores: jnp.ndarray   # (B, D)
    classes: jnp.ndarray  # (B, D) int32
    valid: jnp.ndarray    # (B, D) bool


def forward_inference(
    model: FasterRCNN,
    params,
    image: jnp.ndarray,
    im_info: jnp.ndarray,
    cfg: Config,
) -> Detections:
    """Test-time forward + postprocess (ref test_net.py:~120-200).

    Per image: proposals (test cfg) -> head -> per-class delta decode ->
    score threshold -> per-class NMS(TEST.NMS) -> global top
    ``max_per_image`` across classes.  All sizes fixed; invalid slots
    masked.  Boxes are unscaled back to original image coordinates
    (divide by im_info scale) as the reference does before eval.
    """
    mc = cfg.model
    tc = cfg.test

    if mc.multiscale_roi:
        feat_fine, feat = model.apply(
            {"params": params}, image, method=FasterRCNN.features_pyramid
        )
    else:
        feat_fine = None
        feat = model.apply({"params": params}, image,
                           method=FasterRCNN.features)
    rpn_cls, rpn_bbox = model.apply(
        {"params": params}, feat, method=FasterRCNN.rpn_out
    )
    anchors = make_anchors(cfg, (feat.shape[1], feat.shape[2]))
    props = propose(rpn_cls, rpn_bbox, anchors, im_info, tc.proposal)

    b, n, _ = props.boxes.shape
    if mc.multiscale_roi:
        pooled = _pool_ms(model, params, feat_fine, feat, props.boxes, mc)
    else:
        pooled = pool_rois(feat, props.boxes, None, mc)  # grouped MXU
    cls_logits, bbox_deltas = model.apply(
        {"params": params}, pooled, False, method=FasterRCNN.roi_head
    )

    num_classes = mc.num_classes
    probs = jax.nn.softmax(cls_logits.reshape(b, n, num_classes), axis=-1)

    if tc.bbox_reg:
        if mc.class_agnostic:
            deltas = bbox_deltas.reshape(b, n, 1, 4)
            deltas = jnp.broadcast_to(deltas, (b, n, num_classes, 4))
        else:
            deltas = bbox_deltas.reshape(b, n, num_classes, 4)
        # Un-normalize (ref test_net.py:~160: stds/means folding).
        stds = jnp.asarray(cfg.train.roi_target.bbox_normalize_stds)
        means = jnp.asarray(cfg.train.roi_target.bbox_normalize_means)
        deltas = deltas * stds[None, None, None, :] + means[None, None, None, :]
        boxes = jax.vmap(
            lambda rois_i, d_i: box_ops.bbox_transform_inv(
                rois_i[:, None, :], d_i
            )
        )(props.boxes, deltas)  # (B, N, C, 4)
        boxes = jax.vmap(
            lambda bx, info: box_ops.clip_boxes(bx, info[0], info[1])
        )(boxes, im_info)
    else:
        boxes = jnp.broadcast_to(
            props.boxes[:, :, None, :], (b, n, num_classes, 4)
        )

    # Per-class NMS over foreground classes (skip background 0).  The
    # (B, C) problem flattens to one batch axis so a single batched_nms
    # call covers it (no vmap around the pallas kernel).
    fg_classes = num_classes - 1
    cls_boxes = jnp.transpose(boxes[:, :, 1:, :], (0, 2, 1, 3))
    cls_scores = jnp.transpose(probs[:, :, 1:], (0, 2, 1))
    cand_valid = props.valid[:, None, :] & (cls_scores > tc.score_thresh)

    bc = b * fg_classes
    res = batched_nms(
        cls_boxes.reshape(bc, n, 4),
        cls_scores.reshape(bc, n),
        iou_threshold=tc.nms_thresh,
        max_output=tc.max_dets_per_class,
        valid=cand_valid.reshape(bc, n),
    )
    kept_boxes = jnp.take_along_axis(
        cls_boxes.reshape(bc, n, 4), res.indices[..., None], axis=1
    ).reshape(b, fg_classes, tc.max_dets_per_class, 4)
    kept_scores = jnp.take_along_axis(
        cls_scores.reshape(bc, n), res.indices, axis=1
    )
    kept_scores = jnp.where(res.valid, kept_scores, -1.0).reshape(
        b, fg_classes, tc.max_dets_per_class
    )

    def per_image(kept_boxes_i, kept_scores_i):
        d = fg_classes * tc.max_dets_per_class
        flat_boxes = kept_boxes_i.reshape(d, 4)
        flat_scores = kept_scores_i.reshape(d)
        flat_classes = jnp.repeat(
            jnp.arange(1, num_classes, dtype=jnp.int32),
            tc.max_dets_per_class,
        )
        # Global cap across classes (ref max_per_image=100).
        top_scores, top_idx = jax.lax.top_k(
            flat_scores, min(tc.max_per_image, d)
        )
        return (
            jnp.take(flat_boxes, top_idx, axis=0),
            top_scores,
            jnp.take(flat_classes, top_idx),
            top_scores > 0,
        )

    db, ds, dc, dv = jax.vmap(per_image)(kept_boxes, kept_scores)
    # Back to original image coordinates.
    db = db / im_info[:, 2][:, None, None]
    return Detections(boxes=db, scores=ds, classes=dc, valid=dv)
