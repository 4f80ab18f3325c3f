"""Pure-JAX box/anchor math.

TPU-native rebuild of the reference's L1 layer:
  - anchor generation   (ref lib/model/rpn/generate_anchors.py:~10-100)
  - delta encode/decode (ref lib/model/rpn/bbox_transform.py:~10-120)
  - clipping            (ref bbox_transform.py clip_boxes_*)
  - pairwise IoU        (ref lib/model/utils/bbox.pyx:~10-70 and
                         bbox_transform.py bbox_overlaps_batch)

Everything here is shape-static, vectorized jnp — no Python loops over
boxes — so it fuses into the surrounding jitted program.  Boxes are
``(x1, y1, x2, y2)`` in pixel coordinates, matching the reference
convention where a box's width is ``x2 - x1 + 1`` (the legacy "+1" pixel
convention is kept for numerical parity with the reference's training
recipe; see ``LEGACY_PLUS_ONE``).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# The upstream Faster R-CNN lineage measures box sizes as x2 - x1 + 1.
# Kept for fidelity; flip to 0.0 for the modern convention.
LEGACY_PLUS_ONE = 1.0


# ---------------------------------------------------------------------------
# Anchor generation (host-side, numpy — runs once at trace time)
# ---------------------------------------------------------------------------


def generate_base_anchors(
    base_size: int = 16,
    ratios=(0.5, 1.0, 2.0),
    scales=(8.0, 16.0, 32.0),
) -> np.ndarray:
    """Generate the A = len(ratios)*len(scales) base anchors centred on the
    (0, 0) feature cell.

    Mirrors ref ``generate_anchors`` (lib/model/rpn/generate_anchors.py:~35):
    enumerate aspect ratios of the base box (area-preserving, rounded), then
    scale each.  Returns float32 (A, 4) in (x1, y1, x2, y2).
    """
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)

    base = np.array([0, 0, base_size - 1, base_size - 1], dtype=np.float64)
    w = base[2] - base[0] + LEGACY_PLUS_ONE
    h = base[3] - base[1] + LEGACY_PLUS_ONE
    x_ctr = base[0] + 0.5 * (w - LEGACY_PLUS_ONE)
    y_ctr = base[1] + 0.5 * (h - LEGACY_PLUS_ONE)

    # Ratio enumeration (ref _ratio_enum): round(sqrt(area/ratio)).
    size = w * h
    ws = np.round(np.sqrt(size / ratios))
    hs = np.round(ws * ratios)

    # Scale enumeration (ref _scale_enum) on each ratio anchor.
    ws = (ws[:, None] * scales[None, :]).reshape(-1)
    hs = (hs[:, None] * scales[None, :]).reshape(-1)

    anchors = np.stack(
        [
            x_ctr - 0.5 * (ws - LEGACY_PLUS_ONE),
            y_ctr - 0.5 * (hs - LEGACY_PLUS_ONE),
            x_ctr + 0.5 * (ws - LEGACY_PLUS_ONE),
            y_ctr + 0.5 * (hs - LEGACY_PLUS_ONE),
        ],
        axis=1,
    )
    return anchors.astype(np.float32)


def shift_anchors(
    base_anchors: np.ndarray, feat_height: int, feat_width: int, stride: int
) -> np.ndarray:
    """Tile base anchors over every feature-map cell.

    Mirrors the shift grid built inside ref ``_ProposalLayer.forward``
    (lib/model/rpn/proposal_layer.py:~70) and ``_AnchorTargetLayer``.
    Returns float32 (H*W*A, 4), ordered cell-major then anchor — the same
    ordering as the reference's ``(K, A, 4) -> (K*A, 4)`` reshape, which the
    score layout of the RPN head must match.
    """
    shift_x = np.arange(feat_width, dtype=np.float32) * stride
    shift_y = np.arange(feat_height, dtype=np.float32) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    all_anchors = (
        base_anchors[None, :, :] + shifts[:, None, :]
    ).reshape(-1, 4)
    return all_anchors.astype(np.float32)


# ---------------------------------------------------------------------------
# Box geometry (jnp, shape-static, differentiable where it matters)
# ---------------------------------------------------------------------------


def box_wh_ctr(boxes: jnp.ndarray):
    """Widths, heights, centres. boxes (..., 4)."""
    w = boxes[..., 2] - boxes[..., 0] + LEGACY_PLUS_ONE
    h = boxes[..., 3] - boxes[..., 1] + LEGACY_PLUS_ONE
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return w, h, cx, cy


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Encode gt boxes relative to example boxes as (dx, dy, dw, dh).

    Ref ``bbox_transform_batch`` (lib/model/rpn/bbox_transform.py:~60).
    Shapes broadcast: both (..., 4) -> (..., 4).
    """
    ew, eh, ecx, ecy = box_wh_ctr(ex_rois)
    gw, gh, gcx, gcy = box_wh_ctr(gt_rois)
    ew = jnp.maximum(ew, 1e-6)
    eh = jnp.maximum(eh, 1e-6)
    dx = (gcx - ecx) / ew
    dy = (gcy - ecy) / eh
    dw = jnp.log(jnp.maximum(gw, 1e-6) / ew)
    dh = jnp.log(jnp.maximum(gh, 1e-6) / eh)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_transform_inv(
    boxes: jnp.ndarray, deltas: jnp.ndarray, clip_exp: float = 4.135
) -> jnp.ndarray:
    """Apply predicted deltas to boxes (decode).

    Ref ``bbox_transform_inv`` (lib/model/rpn/bbox_transform.py:~90).
    ``clip_exp`` bounds dw/dh before exp (log(1000/16) ≈ 4.135) to keep the
    decode numerically safe under jit — the reference relied on training
    dynamics never producing huge deltas.
    """
    w, h, cx, cy = box_wh_ctr(boxes)
    dx, dy = deltas[..., 0], deltas[..., 1]
    dw = jnp.clip(deltas[..., 2], -clip_exp, clip_exp)
    dh = jnp.clip(deltas[..., 3], -clip_exp, clip_exp)

    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h

    return jnp.stack(
        [
            pcx - 0.5 * pw,
            pcy - 0.5 * ph,
            pcx + 0.5 * pw - LEGACY_PLUS_ONE,
            pcy + 0.5 * ph - LEGACY_PLUS_ONE,
        ],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, im_height, im_width) -> jnp.ndarray:
    """Clip boxes to image extent (ref ``clip_boxes``,
    lib/model/rpn/bbox_transform.py:~130).

    ``im_height`` / ``im_width`` may be traced scalars (per-image valid
    extent from ``im_info``), broadcast against leading box dims.
    """
    im_height = jnp.asarray(im_height, boxes.dtype)
    im_width = jnp.asarray(im_width, boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0.0, im_width - LEGACY_PLUS_ONE)
    y1 = jnp.clip(boxes[..., 1], 0.0, im_height - LEGACY_PLUS_ONE)
    x2 = jnp.clip(boxes[..., 2], 0.0, im_width - LEGACY_PLUS_ONE)
    y2 = jnp.clip(boxes[..., 3], 0.0, im_height - LEGACY_PLUS_ONE)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    w = boxes[..., 2] - boxes[..., 0] + LEGACY_PLUS_ONE
    h = boxes[..., 3] - boxes[..., 1] + LEGACY_PLUS_ONE
    return jnp.maximum(w, 0.0) * jnp.maximum(h, 0.0)


def bbox_overlaps(boxes: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix, (N, 4) x (M, 4) -> (N, M).

    Ref ``bbox_overlaps`` (lib/model/utils/bbox.pyx:~15) — the Cython
    kernel becomes a broadcasted vectorized op that XLA fuses; there is no
    native component to build.
    """
    ix1 = jnp.maximum(boxes[:, None, 0], query[None, :, 0])
    iy1 = jnp.maximum(boxes[:, None, 1], query[None, :, 1])
    ix2 = jnp.minimum(boxes[:, None, 2], query[None, :, 2])
    iy2 = jnp.minimum(boxes[:, None, 3], query[None, :, 3])

    iw = jnp.maximum(ix2 - ix1 + LEGACY_PLUS_ONE, 0.0)
    ih = jnp.maximum(iy2 - iy1 + LEGACY_PLUS_ONE, 0.0)
    inter = iw * ih

    union = box_area(boxes)[:, None] + box_area(query)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def bbox_overlaps_batch(boxes: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Batched pairwise IoU, (B, N, 4) x (B, M, 4) -> (B, N, M).

    Ref ``bbox_overlaps_batch`` (lib/model/rpn/bbox_transform.py:~150).
    """
    return jax.vmap(bbox_overlaps)(boxes, query)


def smooth_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    inside_weights: jnp.ndarray,
    outside_weights: jnp.ndarray,
    sigma: float = 1.0,
) -> jnp.ndarray:
    """Weighted smooth-L1 used by both RPN and RCNN box losses.

    Ref ``_smooth_l1_loss`` (lib/model/utils/net_utils.py:~60): huber with
    transition point at 1/sigma^2, inside weights select regression targets
    that count, outside weights normalize.  Returns a scalar (sum over box
    dims, mean semantics encoded in outside_weights, matching the ref).
    """
    sigma2 = sigma * sigma
    diff = inside_weights * (pred - target)
    abs_diff = jnp.abs(diff)
    flag = (abs_diff < (1.0 / sigma2)).astype(pred.dtype)
    per_elt = flag * 0.5 * sigma2 * diff * diff + (1.0 - flag) * (
        abs_diff - 0.5 / sigma2
    )
    return jnp.sum(outside_weights * per_elt)
