"""Pallas TPU kernel for the fused RoI-Align double contraction.

TPU-native rethink of the reference RoI Align CUDA kernel
(ref lib/model/roi_align/src/roi_align_kernel.cu:~20-270).  The XLA fast
path (`roi_ops.roi_align_grouped`) expresses RoI Align as two MXU
einsums:

    tmp[b,r,p,w,c] = sum_h wy[b,r,p,h] * feat[b,h,w,c]
    out[b,r,p,q,c] = sum_w wx[b,r,q,w] * tmp[b,r,p,w,c]

XLA materialises ``tmp`` — (B, R, P, W, C) — in HBM between the two
matmuls (matmul outputs do not fuse into matmul inputs).  At inference
shapes (R=300, W=64, C=512, f32) that is ~275 MB written + read back
per image, pure HBM-bandwidth waste.  This kernel runs both
contractions per roi-tile with ``tmp`` living in VMEM registers, so HBM
traffic is just feat once (+ the small weights and output).

Semantics live entirely in the precomputed axis-weight matrices
``wy``/``wx`` (built by `roi_ops._axis_weights` for the torchvision and
adaptive modes, `roi_ops._legacy_axis_weights` for the reference-lineage
mode), so ONE kernel serves all pooling semantics and stays trivially
oracle-testable against the einsum form.

Grid is (B, roi_tiles, w_tiles): W-chunks of the feature map stream
through VMEM and the output block accumulates across them (zero-init at
the first chunk), so maps far larger than VMEM — the res101 stride-8
level is 33 MB — run with a bounded ~8 MB working set.  Small maps
derive a single chunk and behave exactly like the r2 kernel.

Backward: RoI Align is linear in ``features``, and the wrapper exposes
the op through a custom_vjp whose backward reuses the same kernel with
transposed weights is unnecessary — boxes are stop-gradient everywhere
in the model, and XLA differentiates the einsum fallback; the Pallas
path is wired for the inference/forward hot loop (`model.roi_pallas`).

Sharding caveat (this kernel is OPT-IN; the einsum path is the
default): GSPMD has no partitioning rule for a Mosaic custom call, so
under pjit with a batch-sharded operand it would replicate the call.
The einsum default partitions cleanly; if this kernel is ever promoted
to a sharded hot path, wrap it in a batch-axis ``custom_partitioning``
as ``stem_kernel._partitioned_stem`` does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _contract_kernel(wy_ref, wx_ref, feat_ref, out_ref, *, r_tile, p, c,
                     w_tile):
    """One (image, roi-tile, w-tile) step: both contractions, tmp in
    VMEM, accumulating over W chunks.

    wy_ref:  (1, RT, P, H)    per-roi y-axis weights
    wx_ref:  (1, RT, WT, P)   per-roi x-axis weights, W-blocked;
                              TRANSPOSED so the blocked W axis sits in
                              the sublane dim (Mosaic requires the
                              last block dim be /128 or full — P=7 is
                              full, WT only needs /8)
    feat_ref:(1, H, WT*C)     a W-chunk of the feature map (the
                              flattened (W*C) axis blocks into
                              contiguous W-chunks)
    out_ref: (1, RT, P, P, C) — revisited across w-tiles (index map
                              constant in wi): zero-init at wi==0,
                              accumulate after.

    Contraction 1 batches ALL the tile's rois into one MXU dot — the
    feature chunk streams through the MXU once per tile (M = RT*P
    rows) instead of once per roi.  W-tiling (r3) bounds VMEM so big
    maps fit (res101 stride-8: H=64, W=128, C=1024 — the untiled
    kernel needed 33 MB of feature + 29 MB of tmp).
    """
    wi = pl.program_id(2)
    feat2d = feat_ref[0]                                  # (H, WT*C)
    h = feat2d.shape[0]
    # (RT, P, H) -> (RT*P, H): leading-dim merge, layout-free.
    wy_all = wy_ref[0].reshape(r_tile * p, h)
    # Contraction 1: (RT*P, H) x (H, WT*C) -> (RT*P, WT*C) in VMEM.
    tmp = jnp.dot(wy_all, feat2d, preferred_element_type=jnp.float32)
    tmp = tmp.reshape(r_tile * p, w_tile, c)              # lane split

    @pl.when(wi == 0)
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    for r in range(r_tile):                               # static unroll
        wx_t = wx_ref[0, r]                               # (WT, Q)
        for pp in range(p):                               # P is tiny (7)
            # Contraction 2: (WT, Q)^T x (WT, C) -> (Q, C), accumulated
            # (dot_general contracts dim 0 of both — no transpose op).
            out_ref[0, r, pp] += jax.lax.dot_general(
                wx_t, tmp[r * p + pp],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def roi_align_contract(
    wy: jnp.ndarray,        # (B, R, P, H) float32
    wx: jnp.ndarray,        # (B, R, P, W) float32
    features: jnp.ndarray,  # (B, H, W, C)
    *,
    r_tile: int = 8,
    interpret: bool = False,
    w_tile: int | None = None,
) -> jnp.ndarray:
    """Fused double contraction: returns (B, R, P, P, C) float32.

    Pads R up to a multiple of ``r_tile``; numerically identical to
    ``einsum('brph,bhwc->brpwc') -> einsum('brqw,brpwc->brpqc')``.

    Differentiable in ``features`` (custom_vjp: the op is linear, so the
    backward is the transposed pair of einsums — XLA handles the
    scatter-free accumulation).  ``wy``/``wx`` derive from stop-gradient
    boxes everywhere in the model and get zero cotangents.
    """
    return _contract_vjp(r_tile, interpret, w_tile, wy, wx, features)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _contract_vjp(r_tile, interpret, w_tile, wy, wx, features):
    return _contract_impl(r_tile, interpret, wy, wx, features,
                          w_tile_override=w_tile)


def _contract_fwd(r_tile, interpret, w_tile, wy, wx, features):
    return (_contract_impl(r_tile, interpret, wy, wx, features,
                           w_tile_override=w_tile),
            (wy, wx, jnp.zeros((), features.dtype)))


def _contract_bwd(r_tile, interpret, w_tile, res, g):
    wy, wx, feat_proto = res
    # dfeat[b,h,w,c] = sum_{r,p,q} wy[b,r,p,h] wx[b,r,q,w] g[b,r,p,q,c]
    tmp = jnp.einsum("brqw,brpqc->brpwc", wx, g,
                     preferred_element_type=jnp.float32)
    dfeat = jnp.einsum("brph,brpwc->bhwc", wy, tmp,
                       preferred_element_type=jnp.float32)
    return (jnp.zeros_like(wy), jnp.zeros_like(wx),
            dfeat.astype(feat_proto.dtype))


_contract_vjp.defvjp(_contract_fwd, _contract_bwd)


def supported(c: int) -> bool:
    """Mosaic can lane-split the (RT*P, W*C) -> (RT*P, W, C) reshape only
    when C is a multiple of the 128-lane tile (vgg/resnet heads: 512/1024
    — fine; the 64-channel test backbone falls back to the einsum path)."""
    return c % 128 == 0


def _contract_impl(r_tile, interpret, wy, wx, features,
                   w_tile_override=None):
    b, r, p, h = wy.shape
    _, height, width, c = features.shape
    assert wx.shape == (b, r, p, width), (wx.shape, (b, r, p, width))
    assert h == height
    if not (interpret or supported(c)):
        raise ValueError(
            f"roi_align_contract needs C % 128 == 0 on TPU (got C={c}); "
            "gate the call on roi_align_kernel.supported(C)")

    pad = (-r) % r_tile
    if pad:
        wy = jnp.pad(wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, 0), (0, pad), (0, 0), (0, 0)))
    rp = r + pad

    # W-tiling keeps the per-step VMEM bounded: feature chunk
    # (H, WT*C) + tmp (RT*P, WT*C) f32 within ~8 MB.  Small maps run
    # single-chunk (the r2 behaviour).
    if w_tile_override:
        # Non-divisor overrides go through the same W-padding path as
        # auto-selection below (padded columns carry zero wx weight).
        w_tile = int(w_tile_override)
        # Mosaic sublane rule for the transposed-wx block (second-to-
        # last block dim): multiple of 8, or the full axis.  Interpret
        # mode has no such constraint, so tiny-W tests may use it.
        assert interpret or w_tile % 8 == 0 or w_tile >= width, (
            f"w_tile={w_tile} violates the Mosaic sublane rule "
            "(w_tile % 8 == 0 or w_tile == width) on real TPUs")
    else:
        budget = 8 * 1024 * 1024 // 4              # f32 elements
        per_w = (height + r_tile * p) * c          # elements per W col
        cap = max(min(width, budget // per_w), 1)
        if cap >= width:
            w_tile = width                         # single chunk
        else:
            # Prefer a divisor (no padding); Mosaic sublane rule: the
            # W chunk must be a multiple of 8 (or the whole axis).
            w_tile = 0
            for cand in range(cap, 7, -1):
                if width % cand == 0 and cand % 8 == 0:
                    w_tile = cand
                    break
            if not w_tile:
                # No aligned divisor (e.g. W=132): pad W up to a
                # multiple of an aligned tile instead of blowing VMEM
                # with the full width.  Padded columns carry zero wx
                # weight, so the contraction is unchanged.
                w_tile = max(cap - cap % 8, 8)
    wpad = (-width) % w_tile
    if wpad:
        features = jnp.pad(
            features, ((0, 0), (0, 0), (0, wpad), (0, 0)))
        wx = jnp.pad(wx, ((0, 0), (0, 0), (0, 0), (0, wpad)))
        width += wpad
    num_w_tiles = width // w_tile

    feat2d = features.astype(jnp.float32).reshape(b, height, width * c)
    wy = wy.astype(jnp.float32)
    # (B, R, P, W) -> (B, R, W, P): W into the sublane dim (see kernel).
    wx_t = jnp.transpose(wx.astype(jnp.float32), (0, 1, 3, 2))

    grid = (b, rp // r_tile, num_w_tiles)
    out = pl.pallas_call(
        functools.partial(_contract_kernel, r_tile=r_tile, p=p, c=c,
                          w_tile=w_tile),
        out_shape=jax.ShapeDtypeStruct((b, rp, p, p, c), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r_tile, p, height),
                         lambda bi, ri, wi: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_tile, w_tile, p),
                         lambda bi, ri, wi: (bi, ri, wi, 0),
                         memory_space=pltpu.VMEM),
            # Blocks the flattened (W*C) axis into contiguous W-chunks;
            # constant in ri, so a chunk stays resident across roi
            # tiles when the grid iterates ri fastest... the innermost
            # grid dim is wi, so chunks stream per roi-tile instead —
            # feat rereads are (W/WT)x, still far below the einsum
            # path's HBM intermediate.
            pl.BlockSpec((1, height, w_tile * c),
                         lambda bi, ri, wi: (bi, 0, wi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r_tile, p, p, c),
                               lambda bi, ri, wi: (bi, ri, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * rp * p * height * width * c   # contraction 1
            + 2 * b * rp * p * p * width * c,           # contraction 2
            bytes_accessed=b * height * width * c * 4
            + b * rp * p * (height + width) * 4
            + b * rp * p * p * c * 4,
            transcendentals=0,
        ),
    )(wy, wx_t, feat2d)
    return out[:, :r]


def roi_align_grouped_pallas(
    features: jnp.ndarray,   # (B, H, W, C)
    rois: jnp.ndarray,       # (B, R, 4) per-image boxes, image coords
    *,
    output_size: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    sampling_ratio: int = 2,
    aligned: bool = False,
    legacy: bool = False,
    r_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for `roi_ops.roi_align_grouped` / `_legacy_grouped` with the
    fused Pallas contraction.  Returns (B, R, P, P, C) in features.dtype.

    The sampling spec lives in roi_ops (`roi_align_axis_weights` /
    `_legacy_axis_weights`) — shared with the einsum path, so the two
    backends cannot drift numerically.
    """
    from scda_tpu.ops.roi_ops import (
        _legacy_axis_weights, _legacy_sample_coords, roi_align_axis_weights,
    )

    _, height, width, _ = features.shape
    p = output_size
    orig_dtype = features.dtype

    if legacy:
        boxes = jax.lax.stop_gradient(rois.astype(jnp.float32))
        ys, xs = _legacy_sample_coords(boxes, spatial_scale, p)  # (B,R,P)
        wy = _legacy_axis_weights(ys, height)
        wx = _legacy_axis_weights(xs, width)
    else:
        wy, wx = roi_align_axis_weights(
            rois, height, width, output_size=p,
            spatial_scale=spatial_scale, sampling_ratio=sampling_ratio,
            aligned=aligned,
        )

    out = roi_align_contract(wy, wx, features, r_tile=r_tile,
                             interpret=interpret)
    return out.astype(orig_dtype)
