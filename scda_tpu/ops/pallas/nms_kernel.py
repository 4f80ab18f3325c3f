"""Pallas TPU kernel for greedy NMS (backs scda_tpu.ops.nms).

TPU-native rethink of the reference CUDA kernel
(ref lib/model/nms/src/nms_cuda_kernel.cu:~20-150).  The CUDA version
builds an N x N/64 suppression bitmask with one thread per box pair and
finishes with a sequential host-side scan; neither maps to TPU.  Here the
kernel exploits the fact that a Pallas grid on one TensorCore executes
sequentially: the grid walks score-sorted tiles, per-step state (the
bounded buffer of kept boxes + running count) lives in VMEM/SMEM scratch
across grid steps, and each step is pure vector/matrix work:

  step (b, t):
    a. cross-suppression: IoU of the tile's T boxes against the (max_out)
       kept-box buffer — one (T, max_out) matrix op on the VPU;
    b. within-tile greedy: T-iteration fori_loop, each iteration a
       length-T vector suppression update (exact sequential-greedy
       semantics — no fixpoint iteration needed);
    c. masked append into the kept buffer, expressed as a one-hot
       matmul on the MXU (scatter has no Mosaic lowering).

The grid is (batch, tiles): batch rows run back-to-back, and the kept
buffer re-initialises at tile==0 of each row.  This replaces BOTH
reference call sites — per-image proposal NMS (vmapped in the lax
implementation) and per-class test-time NMS — without relying on vmap
semantics over pallas_call (which would re-index program_id and break
the sequential-scratch contract).

Mosaic lowering constraints shaped the code (kept as comments inline):
no gather / dynamic_slice on values (use refs + pl.ds), no cumsum (use
triangular matmul), no i1 loop carries or (N,1) i1 reshapes (carry f32).

Sharding caveat (this kernel is OPT-IN; lax NMS is the default): GSPMD
has no partitioning rule for a Mosaic custom call, so under pjit with a
batch-sharded operand it would replicate the call (all-gather inputs,
redundant compute per chip).  The default lax path partitions cleanly;
if this kernel is ever promoted to a sharded hot path, wrap it in a
batch-axis ``custom_partitioning`` as ``stem_kernel._partitioned_stem``
does.

Inputs must be pre-sorted by descending score with invalid slots pushed
to the end (the wrapper in scda_tpu.ops.nms sorts via lax.top_k).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU (legacy +1 convention to match core.boxes).

    Slice-and-transpose only — integer indexing like ``b[None, :, 0]``
    lowers to an unsupported gather in Mosaic.
    """
    ax1, ay1, ax2, ay2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bt = jnp.transpose(b)  # (4, M)
    bx1, by1, bx2, by2 = bt[0:1, :], bt[1:2, :], bt[2:3, :], bt[3:4, :]
    iw = jnp.maximum(
        jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1) + 1.0, 0.0
    )
    ih = jnp.maximum(
        jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1) + 1.0, 0.0
    )
    inter = iw * ih
    area_a = (ax2 - ax1 + 1.0) * (ay2 - ay1 + 1.0)
    area_b = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)


def _nms_kernel(valid_ref, boxes_ref, keep_ref,
                kept_boxes, count_ref, iou_scratch, *,
                iou_threshold: float, max_output: int, tile: int):
    t = pl.program_id(1)  # tile index within the current batch row

    @pl.when(t == 0)
    def _init():
        kept_boxes[:] = jnp.full_like(kept_boxes[:], -1e9)
        count_ref[0] = 0

    full = jnp.logical_and(t > 0, count_ref[0] >= max_output)

    @pl.when(full)
    def _skip():
        keep_ref[:] = jnp.zeros_like(keep_ref[:])

    @pl.when(jnp.logical_not(full))
    def _work():
        count = count_ref[0]
        tboxes = boxes_ref[:].reshape(tile, 4).astype(jnp.float32)
        tvalid = valid_ref[:].reshape(tile) > 0

        # (a) cross-suppression vs kept buffer.  Dead buffer slots hold
        # the sentinel box (-1e9..) whose IoU with anything is 0.
        iou_prev = _iou_matrix(tboxes, kept_boxes[:])
        crossed = jnp.any(iou_prev > iou_threshold, axis=1)
        alive0 = tvalid & ~crossed

        # (b) exact sequential greedy inside the tile.  Traced-index row
        # reads only work on refs (pl.ds) -> IoU matrix round-trips
        # through VMEM scratch; loop carry must be 32-bit.
        iou_scratch[:] = _iou_matrix(tboxes, tboxes)
        row_ids = lax.broadcasted_iota(jnp.int32, (tile,), 0)

        def body(i, alive_f):
            keep_i = jnp.max(
                alive_f * (row_ids == i).astype(jnp.float32)
            )  # 1.0 iff box i is still alive
            row = iou_scratch[pl.ds(i, 1), :][0]
            suppress = (
                (row > iou_threshold) & (row_ids > i)
            ).astype(jnp.float32) * keep_i
            return alive_f * (1.0 - suppress)

        alive_f = lax.fori_loop(0, tile, body,
                                alive0.astype(jnp.float32))
        alive = alive_f > 0.5

        # Cap to remaining buffer space.  cumsum has no Mosaic lowering;
        # the exclusive prefix sum is a strict-lower-triangular matmul.
        tri = (
            lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
            < lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        ).astype(jnp.float32)
        prefix = jnp.dot(tri, alive.astype(jnp.float32),
                         preferred_element_type=jnp.float32
                         ).astype(jnp.int32)
        slot = count + prefix
        keep = alive & (slot < max_output)

        # (c) masked append as a one-hot matmul (no scatter in Mosaic).
        slot_ids = lax.broadcasted_iota(jnp.int32, (max_output,), 0)
        keep_f = keep.astype(jnp.float32)
        onehot_f = (
            (slot_ids[None, :] == slot[:, None]).astype(jnp.float32)
            * keep_f[:, None]
        )  # (T, max_output)
        new_vals = jnp.dot(jnp.transpose(onehot_f), tboxes,
                           preferred_element_type=jnp.float32)
        filled = jnp.sum(onehot_f, axis=0)
        kept_boxes[:] = jnp.where(filled[:, None] > 0, new_vals,
                                  kept_boxes[:])
        count_ref[0] = count + jnp.sum(keep.astype(jnp.int32))
        keep_ref[:] = keep.astype(jnp.int32).reshape(keep_ref.shape)


def nms_sorted_pallas(
    sboxes: jnp.ndarray,   # (B, N, 4) float32, per-row sorted by score
    svalid: jnp.ndarray,   # (B, N) bool
    *,
    iou_threshold: float,
    max_output: int,
    tile_size: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched greedy NMS over score-sorted boxes.

    Returns a (B, N) bool keep mask; per row, the kept boxes in order are
    the NMS output (at most ``max_output`` are marked).
    """
    squeeze = sboxes.ndim == 2
    if squeeze:
        sboxes = sboxes[None]
        svalid = svalid[None]
    b, n, _ = sboxes.shape
    tile = min(tile_size, n)
    n_pad = (-n) % tile
    if n_pad:
        sboxes = jnp.concatenate(
            [sboxes, jnp.full((b, n_pad, 4), -1e9, sboxes.dtype)], axis=1
        )
        svalid = jnp.concatenate(
            [svalid, jnp.zeros((b, n_pad), svalid.dtype)], axis=1
        )
    n_tiles = (n + n_pad) // tile

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    keep = pl.pallas_call(
        functools.partial(
            _nms_kernel, iou_threshold=float(iou_threshold),
            max_output=int(max_output), tile=tile,
        ),
        grid=(b, n_tiles),
        in_specs=[
            # (B, N, 1) instead of (B, N): TPU block shapes must have
            # their last two dims divisible by (8, 128) or equal to the
            # array dims — (tile, 1) satisfies that; (1, tile) does not
            # once B > 1.
            pl.BlockSpec((1, tile, 1), lambda bi, t: (bi, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 4), lambda bi, t: (bi, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, 1), lambda bi, t: (bi, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n + n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((max_output, 4), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((tile, tile), jnp.float32),
        ],
        interpret=interpret,
    )(svalid.astype(jnp.int32)[..., None], sboxes.astype(jnp.float32))
    keep = keep[:, :n, 0].astype(jnp.bool_)
    return keep[0] if squeeze else keep
