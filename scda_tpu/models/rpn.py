"""Region Proposal Network: head module + static-shape proposal layer.

Rebuild of ref lib/model/rpn/rpn.py (~100 LoC) and
lib/model/rpn/proposal_layer.py (~150 LoC).

Differences by design (TPU-first):
  * The head outputs logits laid out (B, H, W, A, 2) / (B, H, W, A, 4) —
    NHWC with the anchor axis explicit — instead of the reference's
    channel-packed (B, 2A, H, W) + reshape/softmax dance
    (rpn.py:~40 ``reshape(x, d)``).  Flattening H*W*A here matches the
    ordering of :func:`scda_tpu.core.boxes.shift_anchors` (cell-major,
    then anchor), the same pairing contract the reference maintains.
  * The proposal layer is a pure function of arrays -> arrays with fixed
    sizes: top-K by score, masked min-size filter, static NMS
    (:mod:`scda_tpu.ops.nms`), padded output + validity mask.  No host
    sync, no dynamic shapes; it runs inside the one jitted train step.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scda_tpu.config import ProposalConfig
from scda_tpu.core import boxes as box_ops
from scda_tpu.ops.nms import batched_nms


class RPNHead(nn.Module):
    """3x3 conv + twin 1x1 heads (ref rpn.py:~25: RPN_Conv,
    RPN_cls_score, RPN_bbox_pred)."""

    num_anchors: int
    channels: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feat: jnp.ndarray):
        a = self.num_anchors
        x = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(feat)
        x = nn.relu(x)
        cls = nn.Conv(2 * a, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="cls_score")(x)
        bbox = nn.Conv(4 * a, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="bbox_pred")(x)
        b, h, w, _ = cls.shape
        # (B, H, W, A, 2) and (B, H, W, A, 4); flattening (H, W, A) gives
        # the same order as shift_anchors.
        return (
            cls.reshape(b, h, w, a, 2).astype(jnp.float32),
            bbox.reshape(b, h, w, a, 4).astype(jnp.float32),
        )


class Proposals(NamedTuple):
    boxes: jnp.ndarray   # (B, N, 4) float32, canvas coords
    scores: jnp.ndarray  # (B, N) float32 fg scores
    valid: jnp.ndarray   # (B, N) bool


def propose(
    rpn_cls_logits: jnp.ndarray,   # (B, H, W, A, 2)
    rpn_bbox_pred: jnp.ndarray,    # (B, H, W, A, 4)
    anchors: jnp.ndarray,          # (H*W*A, 4)
    im_info: jnp.ndarray,          # (B, 3): valid_h, valid_w, scale
    cfg: ProposalConfig,
) -> Proposals:
    """Static-shape proposal generation (ref proposal_layer.py:~60-140).

    Pipeline per image: softmax fg score -> decode deltas on anchors ->
    clip to the image's valid extent -> mask boxes below min_size ->
    ``pre_nms_top_n`` by score -> NMS(``nms_thresh``) -> fixed
    ``post_nms_top_n`` outputs with validity mask.
    """
    b = rpn_cls_logits.shape[0]
    k = anchors.shape[0]

    # The proposal layer is a CONSTANT w.r.t. the loss, exactly as in
    # the reference (proposal_layer runs under no-grad; RPN trains only
    # through its own cls/bbox losses).  Without this, gradients leak
    # from the RCNN targets back through box decode/top-k/NMS gathers —
    # semantically wrong AND each gather transposes to a serial
    # scatter-add while-loop (measured in the r2 HLO dump).
    rpn_cls_logits = jax.lax.stop_gradient(rpn_cls_logits)
    rpn_bbox_pred = jax.lax.stop_gradient(rpn_bbox_pred)

    scores = jax.nn.softmax(rpn_cls_logits, axis=-1)[..., 1].reshape(b, k)
    deltas = rpn_bbox_pred.reshape(b, k, 4)

    def decode_one(scores_i, deltas_i, info_i):
        boxes = box_ops.bbox_transform_inv(anchors, deltas_i)
        boxes = box_ops.clip_boxes(boxes, info_i[0], info_i[1])

        # min-size filter (ref _filter_boxes, proposal_layer.py:~150),
        # threshold scaled by the image scale as in the reference.
        ws = boxes[:, 2] - boxes[:, 0] + box_ops.LEGACY_PLUS_ONE
        hs = boxes[:, 3] - boxes[:, 1] + box_ops.LEGACY_PLUS_ONE
        min_size = cfg.min_size * info_i[2]
        size_ok = (ws >= min_size) & (hs >= min_size)
        scores_i = jnp.where(size_ok, scores_i, -1e30)

        pre_n = min(cfg.pre_nms_top_n, k)
        top_scores, top_idx = jax.lax.top_k(scores_i, pre_n)
        top_boxes = jnp.take(boxes, top_idx, axis=0)
        top_valid = top_scores > -1e29
        return top_boxes, top_scores, top_valid

    # Decode/filter/top-k vmaps; NMS runs OUTSIDE the vmap so the pallas
    # backend sees the batch as its own grid dimension (vmapping
    # pallas_call would break its sequential-scratch contract).
    tb, ts, tv = jax.vmap(decode_one)(scores, deltas, im_info)
    # top_k already returned descending order with invalid at the end.
    res = batched_nms(
        tb, ts, iou_threshold=cfg.nms_thresh,
        max_output=cfg.post_nms_top_n, valid=tv, pre_sorted=True,
    )
    out_boxes = jnp.take_along_axis(tb, res.indices[..., None], axis=1)
    out_scores = jnp.take_along_axis(ts, res.indices, axis=1)
    out_boxes = jnp.where(res.valid[..., None], out_boxes, 0.0)
    out_scores = jnp.where(res.valid, out_scores, 0.0)
    return Proposals(boxes=out_boxes, scores=out_scores, valid=res.valid)
