"""RoI Align / RoI Pool with fully static shapes.

TPU-native replacement for the reference's CUDA pooling ops:
  - RoI Align (ref lib/model/roi_align/src/roi_align_kernel.cu:~20-270)
  - RoI Pool  (ref lib/model/roi_pooling/src/roi_pooling_kernel.cu:~20-160)

Design notes (not a port):
  * The CUDA kernels thread per output element and store argmax buffers for
    a hand-written backward.  Here both ops are expressed as vectorized
    gathers from the (flattened) feature map — XLA differentiates them for
    free (gather -> scatter-add), so no custom backward is required for
    correctness.  The hot path is the MXU matmul formulation
    (:func:`roi_align_grouped`), measured faster than the gather form.
    A fused Pallas kernel of the same contraction pair
    (scda_tpu/ops/pallas/roi_align_kernel.py, opt-in via
    ``model.roi_pallas``) keeps the intermediate in VMEM — another
    1.55-1.97x on-chip (RESULTS.md).
  * RoI Align comes in TWO semantics, config-switchable:
      - :func:`roi_align` — torchvision/Detectron spec (``sampling_ratio``
        bilinear samples per bin edge, averaged; ``sampling_ratio=0`` =
        per-roi adaptive count, like torchvision), ``aligned`` half-pixel
        option.
      - :func:`roi_align_legacy` — the reference lineage's crop-and-resize
        style kernel (ref lib/model/roi_align/src/roi_align_kernel.cu:
        ~20-270): ONE bilinear sample per output element at bin-corner
        grid points, bin size roi/(P-1) with the +1 roi-size convention,
        zero outside the map, floor clamped to size-2 (which extrapolates
        in the last half-cell exactly as the CUDA kernel does).
    Both are pinned by element-wise numpy oracles in tests/test_roi_ops.py.
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
      sampling_ratio: bilinear samples per bin edge; 0 = torchvision's
        adaptive rule (per-roi ceil(roi_size / P), computed under a
        static bound with masked samples).
      aligned: half-pixel offset correction (torchvision ``aligned=True``).

    Returns:
      (R, P, P, C) pooled features, dtype of ``features``.
    """
    boxes, bidx = _split_rois(rois, batch_indices)
    b, height, width, c = features.shape
    p = output_size
    adaptive = int(sampling_ratio) <= 0
    # Static sample bound: adaptive S = ceil(roi/P) <= ceil(size/P).
    s = (max(-(-max(height, width) // p), 1) if adaptive
         else max(int(sampling_ratio), 1))

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

    if adaptive:
        # Per-roi sample counts (traced values; shapes stay static).
        sy = jnp.clip(jnp.ceil(roi_h / p), 1, s)        # (R,)
        sx = jnp.clip(jnp.ceil(roi_w / p), 1, s)
    else:
        sy = sx = jnp.full(boxes.shape[:1], float(s), jnp.float32)

    # Sample grid: (P, S) fractional offsets within the roi, per axis.
    ph = jnp.arange(p, dtype=jnp.float32)
    k = jnp.arange(s, dtype=jnp.float32)
    # (R, S) in-bin offsets and validity per axis.
    iy = (k[None, :] + 0.5) / sy[:, None]
    ix = (k[None, :] + 0.5) / sx[:, None]
    my = k[None, :] < sy[:, None]                        # (R, S)
    mx = k[None, :] < sx[:, None]
    # (R, P, S) absolute coords per axis.
    ys = y1[:, None, None] + (ph[None, :, None] + iy[:, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (ph[None, :, None] + ix[:, None, :]) * bin_w[:, None, None]

    # Broadcast to the full (R, P, S, P, S) sample lattice.
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy, xx = jnp.broadcast_arrays(yy, xx)

    batch_offset = (bidx * (height * width))[:, None, None, None, None]
    vals = _bilinear_gather(flat, batch_offset, yy, xx, height, width)
    # Average the valid samples per bin.
    mm = (my[:, None, :, None, None] & mx[:, None, None, None, :])
    mm = jnp.broadcast_to(mm, yy.shape)[..., None].astype(jnp.float32)
    r = boxes.shape[0]
    num = (vals * mm).reshape(r, p, s, p, s, c).sum(axis=(2, 4))
    den = (sy * sx)[:, None, None, None]
    out = num / den
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


def _axis_weights(coords: jnp.ndarray, size: int,
                  sample_mask: jnp.ndarray | None = None,
                  denom: jnp.ndarray | float | None = None) -> jnp.ndarray:
    """Per-sample bilinear weights scattered onto the feature grid.

    coords: (..., S) fractional sample coordinates along one axis.
    sample_mask: optional (..., S) {0,1} — inactive samples (adaptive
    sampling_ratio under the static bound) contribute nothing.
    denom: per-roi sample count to average by (default: static S).
    Returns (..., size): sum over the active samples of their two-tap
    bilinear weights (torchvision border rules: points outside
    [-1, size] drop, in-range points clamp), divided by ``denom``.
    """
    s = coords.shape[-1]
    valid = ((coords >= -1.0) & (coords <= float(size))).astype(jnp.float32)
    if sample_mask is not None:
        valid = valid * sample_mask
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
    if denom is None:
        denom = float(s)
    return jnp.sum(w, axis=-2) / denom


def roi_align_axis_weights(
    rois: jnp.ndarray,       # (B, R, 4) per-image boxes, image coords
    height: int,
    width: int,
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-axis RoI-Align weight matrices (wy (B,R,P,H), wx (B,R,P,W)).

    The SINGLE source of the torchvision/adaptive sampling spec — both
    the einsum form (:func:`roi_align_grouped`) and the fused Pallas
    kernel (ops/pallas/roi_align_kernel.py) contract these against the
    feature map, so their numerics agree by construction.
    """
    b = rois.shape[0]
    p = output_size
    adaptive = int(sampling_ratio) <= 0
    s = (max(-(-max(height, width) // p), 1) if adaptive
         else max(int(sampling_ratio), 1))

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
    k = jnp.arange(s, dtype=jnp.float32)             # (S,)
    if adaptive:
        sy = jnp.clip(jnp.ceil(roi_h / p), 1, s)     # (B, R)
        sx = jnp.clip(jnp.ceil(roi_w / p), 1, s)
        fy = (k + 0.5) / sy[..., None]               # (B, R, S)
        fx = (k + 0.5) / sx[..., None]
        my = (k < sy[..., None]).astype(jnp.float32)
        mx = (k < sx[..., None]).astype(jnp.float32)
        my = jnp.broadcast_to(my[..., None, :], (b, rois.shape[1], p, s))
        mx = jnp.broadcast_to(mx[..., None, :], (b, rois.shape[1], p, s))
        dy, dx = sy[..., None, None], sx[..., None, None]
    else:
        fy = fx = jnp.broadcast_to((k + 0.5) / s, boxes.shape[:2] + (s,))
        my = mx = None
        dy = dx = None
    # (B, R, P, S) absolute sample coordinates per axis.
    ys = (
        y1[..., None, None]
        + (ph[None, None, :, None] + fy[..., None, :])
        * bin_h[..., None, None]
    )
    xs = (
        x1[..., None, None]
        + (ph[None, None, :, None] + fx[..., None, :])
        * bin_w[..., None, None]
    )

    wy = _axis_weights(ys, height, my, dy)           # (B, R, P, H)
    wx = _axis_weights(xs, width, mx, dx)            # (B, R, P, W)
    return wy, wx


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
    _, height, width, _ = features.shape
    wy, wx = roi_align_axis_weights(
        rois, height, width, output_size=output_size,
        spatial_scale=spatial_scale, sampling_ratio=sampling_ratio,
        aligned=aligned,
    )
    return _contract_axis_weights(wy, wx, features)


def _contract_axis_weights(wy, wx, features):
    """The einsum contraction pair, intermediate-size aware.

    XLA materialises the intermediate in HBM (matmul outputs don't fuse
    into matmul inputs), sized R*P*C times the NON-contracted spatial
    axis — so contract the LARGER axis first (landscape canvases:
    W > H, so w-first halves it; measured 2.98 ms of the 6.39 ms
    res101-multiscale step before this, r3).  When the features are
    bf16 (serving), the intermediate is stored bf16 too (accumulation
    stays f32 via preferred_element_type): activations already carry
    bf16 precision, and it halves the intermediate's HBM traffic again.
    """
    b, height, width, c = features.shape
    orig_dtype = features.dtype
    tmp_dtype = (jnp.bfloat16 if orig_dtype == jnp.bfloat16
                 else jnp.float32)
    feat = features.astype(jnp.float32)
    if width > height:
        # (B, R, Q, W) x (B, H, W, C) -> (B, R, Q, H, C)
        tmp = jnp.einsum("brqw,bhwc->brqhc", wx, feat,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("brph,brqhc->brpqc", wy, tmp.astype(tmp_dtype),
                         preferred_element_type=jnp.float32)
    else:
        # (B, R, P, H) x (B, H, W, C) -> (B, R, P, W, C)
        tmp = jnp.einsum("brph,bhwc->brpwc", wy, feat,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("brqw,brpwc->brpqc", wx, tmp.astype(tmp_dtype),
                         preferred_element_type=jnp.float32)
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Legacy (reference-lineage) RoI Align semantics
# ---------------------------------------------------------------------------
#
# The reference's roi_align_kernel.cu (ref lib/model/roi_align/src/
# roi_align_kernel.cu:~20-270, crop-and-resize lineage) differs from the
# torchvision spec in every detail that matters for weight-parity:
#   * roi size uses the +1 convention: roi_w = max(x2s - x1s + 1, 0);
#   * bin size divides by (P - 1), so the P sample points span the roi
#     corner-to-corner (a resize grid, not bin centers);
#   * ONE bilinear sample per output element (no sampling_ratio average);
#   * a sample outside [0, size) writes 0;
#   * in-range samples take floor() clamped to size-2, so the last
#     half-cell *extrapolates* (ratio > 1) — reproduced bit-for-bit here.
# Use ``pooling_mode="align_legacy"`` when evaluating converted reference
# checkpoints; mAP parity within 0.5 can hinge on this (VERDICT r1 #2).


def _legacy_sample_coords(boxes, spatial_scale, p):
    """(y, x) bin-corner sample lattice coords per axis, legacy rules."""
    x1 = boxes[..., 0] * spatial_scale
    y1 = boxes[..., 1] * spatial_scale
    x2 = boxes[..., 2] * spatial_scale
    y2 = boxes[..., 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1 + 1.0, 0.0)
    roi_h = jnp.maximum(y2 - y1 + 1.0, 0.0)
    d = float(max(p - 1, 1))
    bin_w = roi_w / d
    bin_h = roi_h / d
    ph = jnp.arange(p, dtype=jnp.float32)
    ys = y1[..., None] + ph * bin_h[..., None]       # (..., P)
    xs = x1[..., None] + ph * bin_w[..., None]
    return ys, xs


def _legacy_axis_weights(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """Two-tap legacy bilinear weights scattered onto the grid.

    coords: (..., P) sample coordinate along one axis.  Out-of-range
    ([0, size)) rows are all-zero (the kernel writes 0); in-range rows
    put (1-ratio, ratio) at (start, start+1) with start = min(floor(c),
    size-2) — ratio may exceed 1 in the last half-cell (extrapolation),
    exactly as the CUDA kernel computes it.
    """
    valid = ((coords >= 0.0) & (coords < float(size))).astype(jnp.float32)
    start = jnp.minimum(jnp.floor(coords), size - 2).astype(jnp.int32)
    start = jnp.maximum(start, 0)
    ratio = coords - start.astype(jnp.float32)
    grid = jnp.arange(size, dtype=jnp.int32)
    w = (
        ((1.0 - ratio) * valid)[..., None] * (grid == start[..., None])
        + (ratio * valid)[..., None] * (grid == (start + 1)[..., None])
    )                                                # (..., P, size)
    return w


def roi_align_legacy(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    batch_indices: jnp.ndarray | None = None,
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
) -> jnp.ndarray:
    """Reference-lineage RoI Align (flat rois form).  Returns (R, P, P, C)."""
    boxes, bidx = _split_rois(rois, batch_indices)
    b, height, width, c = features.shape
    p = output_size
    orig_dtype = features.dtype
    flat = features.reshape(b * height * width, c).astype(jnp.float32)
    boxes = jax.lax.stop_gradient(boxes.astype(jnp.float32))

    ys, xs = _legacy_sample_coords(boxes, spatial_scale, p)  # (R, P)
    valid = (
        ((ys >= 0.0) & (ys < height))[:, :, None]
        & ((xs >= 0.0) & (xs < width))[:, None, :]
    )                                                 # (R, P, P)
    ystart = jnp.clip(jnp.floor(ys), 0, height - 2)
    xstart = jnp.clip(jnp.floor(xs), 0, width - 2)
    ry = (ys - ystart)[:, :, None, None]              # (R, P, 1, 1)
    rx = (xs - xstart)[:, None, :, None]              # (R, 1, P, 1)
    y0 = ystart.astype(jnp.int32)[:, :, None]
    x0 = xstart.astype(jnp.int32)[:, None, :]
    batch_offset = (bidx * (height * width))[:, None, None]

    def g(yy, xx):
        return jnp.take(flat, batch_offset + yy * width + xx, axis=0)

    val = (
        (1 - ry) * (1 - rx) * g(y0, x0)
        + (1 - ry) * rx * g(y0, x0 + 1)
        + ry * (1 - rx) * g(y0 + 1, x0)
        + ry * rx * g(y0 + 1, x0 + 1)
    )
    out = jnp.where(valid[..., None], val, 0.0)
    return out.astype(orig_dtype)


def roi_align_legacy_grouped(
    features: jnp.ndarray,   # (B, H, W, C)
    rois: jnp.ndarray,       # (B, R, 4)
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
) -> jnp.ndarray:
    """Reference-lineage RoI Align as two MXU contractions (fast path).

    The legacy kernel is separable like the torchvision one: the
    out-of-range-to-zero rule factorizes because a zero weight row on
    either axis zeroes the product.  Returns (B, R, P, P, C).
    """
    b, height, width, c = features.shape
    p = output_size
    boxes = jax.lax.stop_gradient(rois.astype(jnp.float32))

    ys, xs = _legacy_sample_coords(boxes, spatial_scale, p)  # (B, R, P)
    wy = _legacy_axis_weights(ys, height)            # (B, R, P, H)
    wx = _legacy_axis_weights(xs, width)             # (B, R, P, W)
    return _contract_axis_weights(wy, wx, features)


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
