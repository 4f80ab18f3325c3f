"""RoI Align / RoI Pool with fully static shapes.

TPU-native replacement for the reference's CUDA pooling ops:
  - RoI Align (ref lib/model/roi_align/src/roi_align_kernel.cu:~20-270)
  - RoI Pool  (ref lib/model/roi_pooling/src/roi_pooling_kernel.cu:~20-160)

Design notes (not a port):
  * The CUDA kernels thread per output element and store argmax buffers for
    a hand-written backward.  Here both ops are expressed as vectorized
    gathers from the (flattened) feature map — XLA differentiates them for
    free (gather -> scatter-add), so no custom backward is required for
    correctness.  A Pallas forward kernel that keeps the feature map in
    VMEM lives in ``scda_tpu.ops.pallas`` for the hot path.
  * RoI Align follows the torchvision/Detectron sampling spec
    (``sampling_ratio`` bilinear samples per bin edge, averaged), with the
    ``aligned`` half-pixel option.  Semantics are pinned by the numpy
    oracle in tests/test_roi_ops.py.
  * RoI Pool keeps the reference's *exact* quantized max-pool semantics —
    variable-size bins are handled by gathering a static ``max_bin``-sized
    window per bin (bounded at trace time by ceil(feat_size / pool) + 1)
    and masking, instead of the dynamic loops of the CUDA kernel.
  * RoIs are (R, 4) boxes plus an (R,) batch index — the reference packs
    these as (R, 5) with the index in column 0 (faster_rcnn.py:~90); both
    layouts are accepted.

All inputs/outputs are NHWC (TPU-native layout; the reference is NCHW).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split_rois(rois, batch_indices):
    if rois.shape[-1] == 5 and batch_indices is None:
        return rois[:, 1:5], rois[:, 0].astype(jnp.int32)
    if batch_indices is None:
        batch_indices = jnp.zeros((rois.shape[0],), jnp.int32)
    return rois, batch_indices.astype(jnp.int32)


def _bilinear_gather(flat_feat, batch_offset, y, x, height, width):
    """Bilinear sample at fractional (y, x), with torchvision border rules.

    flat_feat: (B*H*W, C).  batch_offset/y/x: (...) broadcastable.
    Points outside [-1, size] contribute zero; in-range points clamp.
    """
    oob = (y < -1.0) | (y > height) | (x < -1.0) | (x > width)
    y = jnp.clip(y, 0.0, height - 1.0)
    x = jnp.clip(x, 0.0, width - 1.0)

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, height - 1)
    x1i = jnp.minimum(x0i + 1, width - 1)

    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    hy = 1.0 - ly
    hx = 1.0 - lx

    def g(yy, xx):
        idx = batch_offset + yy * width + xx
        return jnp.take(flat_feat, idx, axis=0)

    val = (
        hy * hx * g(y0i, x0i)
        + hy * lx * g(y0i, x1i)
        + ly * hx * g(y1i, x0i)
        + ly * lx * g(y1i, x1i)
    )
    return jnp.where(oob[..., None], 0.0, val)


def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    batch_indices: jnp.ndarray | None = None,
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
) -> jnp.ndarray:
    """RoI Align.

    Args:
      features: (B, H, W, C) feature map.
      rois: (R, 4) boxes in image coords, or (R, 5) with batch idx first.
      batch_indices: (R,) int32, which image each roi comes from.
      output_size: pooled side P (ref cfg.POOLING_SIZE = 7).
      spatial_scale: feature stride reciprocal (ref 1/16).
      sampling_ratio: bilinear samples per bin edge (static; ref adaptive).
      aligned: half-pixel offset correction (torchvision ``aligned=True``).

    Returns:
      (R, P, P, C) pooled features, dtype of ``features``.
    """
    boxes, bidx = _split_rois(rois, batch_indices)
    b, height, width, c = features.shape
    p = output_size
    s = max(int(sampling_ratio), 1)

    orig_dtype = features.dtype
    flat = features.reshape(b * height * width, c).astype(jnp.float32)
    boxes = jax.lax.stop_gradient(boxes.astype(jnp.float32))

    offset = 0.5 if aligned else 0.0
    x1 = boxes[:, 0] * spatial_scale - offset
    y1 = boxes[:, 1] * spatial_scale - offset
    x2 = boxes[:, 2] * spatial_scale - offset
    y2 = boxes[:, 3] * spatial_scale - offset

    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_w = roi_w / p
    bin_h = roi_h / p

    # Sample grid: (P, S) fractional offsets within the roi, per axis.
    ph = jnp.arange(p, dtype=jnp.float32)
    iy = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    # (R, P, S) absolute coords per axis.
    ys = y1[:, None, None] + (ph[None, :, None] + iy[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (ph[None, :, None] + iy[None, None, :]) * bin_w[:, None, None]

    # Broadcast to the full (R, P, S, P, S) sample lattice.
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)

    batch_offset = (bidx * (height * width))[:, None, None, None, None]
    vals = _bilinear_gather(flat, batch_offset, yy, xx, height, width)
    # Average the S*S samples per bin.
    out = vals.reshape(boxes.shape[0], p, s, p, s, c).mean(axis=(2, 4))
    return out.astype(orig_dtype)


def roi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    batch_indices: jnp.ndarray | None = None,
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
) -> jnp.ndarray:
    """Quantized max RoI pooling with the reference's exact bin math.

    Ref semantics (roi_pooling_kernel.cu:~40): roi corners are rounded to
    feature cells, roi size is measured end-start+1 with a floor of 1,
    bin [ph] spans [floor(ph*rh/P), ceil((ph+1)*rh/P)), clamped to the map;
    empty bins output 0.
    """
    boxes, bidx = _split_rois(rois, batch_indices)
    b, height, width, c = features.shape
    p = output_size

    orig_dtype = features.dtype
    flat = features.reshape(b * height * width, c).astype(jnp.float32)
    boxes = jax.lax.stop_gradient(boxes.astype(jnp.float32))

    x1 = jnp.round(boxes[:, 0] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(boxes[:, 1] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(boxes[:, 2] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(boxes[:, 3] * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)

    # Static upper bound on cells per bin.
    max_bin = max(-(-max(height, width) // p) + 1, 1)

    ph = jnp.arange(p, dtype=jnp.int32)

    def bin_bounds(start, roi_size, limit):
        # (R, P) start/end cell indices per bin, clamped.  Pure integer
        # arithmetic: floor(a/b) = a//b and ceil(a/b) = (a+b-1)//b are
        # exact, unlike float division which XLA may rewrite as a
        # reciprocal multiply (turning e.g. 21/7 into 3.0000002, whose
        # ceil silently widens the bin).
        lo = (ph[None, :] * roi_size[:, None]) // p + start[:, None]
        hi = ((ph[None, :] + 1) * roi_size[:, None] + p - 1) // p + start[:, None]
        lo = jnp.clip(lo, 0, limit)
        hi = jnp.clip(hi, 0, limit)
        return lo, hi

    ylo, yhi = bin_bounds(y1, roi_h, height)
    xlo, xhi = bin_bounds(x1, roi_w, width)

    win = jnp.arange(max_bin, dtype=jnp.int32)
    # (R, P, max_bin) candidate cells per axis + validity.
    ycells = ylo[:, :, None] + win[None, None, :]
    yvalid = ycells < yhi[:, :, None]
    ycells = jnp.minimum(ycells, height - 1)
    xcells = xlo[:, :, None] + win[None, None, :]
    xvalid = xcells < xhi[:, :, None]
    xcells = jnp.minimum(xcells, width - 1)

    # Full (R, P, max_bin, P, max_bin) lattice of cells.
    yy = ycells[:, :, :, None, None]
    xx = xcells[:, None, None, :, :]
    vv = yvalid[:, :, :, None, None] & xvalid[:, None, None, :, :]
    yy, xx, vv = jnp.broadcast_arrays(yy, xx, vv)

    batch_offset = (bidx.astype(jnp.int32) * (height * width))[
        :, None, None, None, None
    ]
    idx = batch_offset + yy * width + xx
    vals = jnp.take(flat, idx, axis=0)
    vals = jnp.where(vv[..., None], vals, -jnp.inf)

    r = boxes.shape[0]
    out = vals.reshape(r, p, max_bin, p, max_bin, c).max(axis=(2, 4))
    # Empty bins (all cells invalid) -> 0, matching the CUDA kernel init.
    out = jnp.where(jnp.isfinite(out), out, 0.0)
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# MXU formulation of RoI Align: gathers -> matmuls
# ---------------------------------------------------------------------------
#
# RoI Align is a *linear* operator on the feature map, and the bilinear
# kernel factorizes per axis, so the whole op is two small matrix
# contractions:
#
#   out[r, p, q, c] = sum_h sum_w Wy[r, p, h] * Wx[r, q, w] * feat[h, w, c]
#
# where Wy[r, p, :] holds the (1/S)-averaged bilinear weights of bin p's S
# sample rows (each row has at most 2S nonzeros).  This replaces the
# random-access gathers of the CUDA/XLA formulation (the reference's
# roi_align_kernel.cu threads one CUDA lane per sample point) with dense
# MXU work — the canonical TPU rewrite.  Numerically identical to
# :func:`roi_align` (same sample coords, same border rules; only the
# float summation order differs).


def _axis_weights(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """Per-sample bilinear weights scattered onto the feature grid.

    coords: (..., S) fractional sample coordinates along one axis.
    Returns (..., size): sum over the S samples of their two-tap bilinear
    weights (torchvision border rules: points outside [-1, size] drop,
    in-range points clamp), divided by S (the per-bin average).
    """
    s = coords.shape[-1]
    valid = ((coords >= -1.0) & (coords <= float(size))).astype(jnp.float32)
    c = jnp.clip(coords, 0.0, size - 1.0)
    c0 = jnp.floor(c)
    low = c0.astype(jnp.int32)                       # (..., S)
    high = jnp.minimum(low + 1, size - 1)
    w_high = (c - c0) * valid
    w_low = (1.0 - (c - c0)) * valid

    grid = jnp.arange(size, dtype=jnp.int32)         # (size,)
    w = (
        w_low[..., None] * (grid == low[..., None])
        + w_high[..., None] * (grid == high[..., None])
    )                                                # (..., S, size)
    return jnp.sum(w, axis=-2) / float(s)


def roi_align_grouped(
    features: jnp.ndarray,   # (B, H, W, C)
    rois: jnp.ndarray,       # (B, R, 4) per-image boxes, image coords
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
) -> jnp.ndarray:
    """RoI Align for per-image grouped rois, as two MXU contractions.

    Returns (B, R, P, P, C) in the dtype of ``features``.
    """
    b, height, width, c = features.shape
    p = output_size
    s = max(int(sampling_ratio), 1)
    orig_dtype = features.dtype

    boxes = jax.lax.stop_gradient(rois.astype(jnp.float32))
    offset = 0.5 if aligned else 0.0
    x1 = boxes[..., 0] * spatial_scale - offset      # (B, R)
    y1 = boxes[..., 1] * spatial_scale - offset
    x2 = boxes[..., 2] * spatial_scale - offset
    y2 = boxes[..., 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / p
    bin_h = roi_h / p

    ph = jnp.arange(p, dtype=jnp.float32)            # (P,)
    frac = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s  # (S,)
    # (B, R, P, S) absolute sample coordinates per axis.
    ys = (
        y1[..., None, None]
        + (ph[None, None, :, None] + frac[None, None, None, :])
        * bin_h[..., None, None]
    )
    xs = (
        x1[..., None, None]
        + (ph[None, None, :, None] + frac[None, None, None, :])
        * bin_w[..., None, None]
    )

    wy = _axis_weights(ys, height)                   # (B, R, P, H)
    wx = _axis_weights(xs, width)                    # (B, R, P, W)

    feat = features.astype(jnp.float32)
    # (B, R, P, H) x (B, H, W, C) -> (B, R, P, W, C)
    tmp = jnp.einsum("brph,bhwc->brpwc", wy, feat,
                     preferred_element_type=jnp.float32)
    # (B, R, Q, W) x (B, R, P, W, C) -> (B, R, P, Q, C)
    out = jnp.einsum("brqw,brpwc->brpqc", wx, tmp,
                     preferred_element_type=jnp.float32)
    return out.astype(orig_dtype)


def roi_crop(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    batch_indices: jnp.ndarray | None = None,
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
) -> jnp.ndarray:
    """RoI Crop: affine-grid bilinear crop then 2x2 max-pool.

    Rebuild of the reference's ``POOLING_MODE=crop`` path
    (ref lib/model/roi_crop/src/roi_crop_cuda_kernel.cu:~20-250 +
    ``_affine_grid_gen`` in faster_rcnn.py:~95): a (2P x 2P) sample grid
    spans the roi corner-to-corner (align_corners affine_grid
    semantics), bilinear-sampled with zero padding, then max-pooled 2x2
    (ref ``F.max_pool2d(grid_sample(...), 2, 2)``).

    Returns (R, P, P, C).
    """
    boxes, bidx = _split_rois(rois, batch_indices)
    b, height, width, c = features.shape
    p = output_size
    g = 2 * p

    orig_dtype = features.dtype
    flat = features.reshape(b * height * width, c).astype(jnp.float32)
    boxes = jax.lax.stop_gradient(boxes.astype(jnp.float32))

    x1 = boxes[:, 0] * spatial_scale
    y1 = boxes[:, 1] * spatial_scale
    x2 = boxes[:, 2] * spatial_scale
    y2 = boxes[:, 3] * spatial_scale

    t = jnp.linspace(0.0, 1.0, g)                     # corner-inclusive
    ys = y1[:, None] + t[None, :] * (y2 - y1)[:, None]   # (R, G)
    xs = x1[:, None] + t[None, :] * (x2 - x1)[:, None]

    yy = ys[:, :, None]
    xx = xs[:, None, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)             # (R, G, G)

    batch_offset = (bidx * (height * width))[:, None, None]
    vals = _bilinear_gather(flat, batch_offset, yy, xx, height, width)
    # 2x2 max-pool to (P, P).
    r = boxes.shape[0]
    vals = vals.reshape(r, p, 2, p, 2, c).max(axis=(2, 4))
    return vals.astype(orig_dtype)
