"""Static-shape greedy non-maximum suppression for TPU.

TPU-native replacement for the reference's CUDA NMS
(ref lib/model/nms/src/nms_cuda_kernel.cu:~20-150 and nms_wrapper.py): the
CUDA kernel computes a 64-bit suppression bitmask per block and finishes
with a sequential host-side scan over dynamic shapes.  Neither dynamic
output shapes nor host scans exist in an XLA program, so the algorithm is
rethought:

  1. Sort boxes by score (``lax.top_k`` — full static sort).
  2. Walk the sorted boxes tile by tile (``lax.while_loop``, early exit
     once ``max_output`` boxes are kept):
       a. *Cross suppression*: IoU of the tile against the bounded buffer
          of already-kept boxes — O(T * max_output) per tile, so overall
          O(N * max_output) instead of the naive O(N^2).
       b. *Within-tile greedy*: exact greedy keep via fixpoint iteration
          on the strict-upper-triangular IoU>thr matrix.  The fixpoint of
          ``k[j] = alive[j] & ~exists i<j: k[i] & iou[i,j]`` is unique and
          equals the sequential greedy result (induction on position), and
          iteration converges in at most tile-size steps (in practice a
          handful, since suppression chains in detections are short).
       c. Kept boxes are appended to the buffer with a masked scatter.
  3. Outputs are fixed-size: ``indices (max_output,)`` into the caller's
     box array plus a validity mask — downstream consumers stay
     shape-static and mask instead of slicing.

Everything runs on-device inside jit; there is no host synchronisation
(the reference round-trips Python<->CUDA per call, proposal_layer.py:~100).

A Pallas kernel with the same contract lives in
``scda_tpu.ops.pallas.nms_kernel`` and is used when enabled; this module
is the portable lax reference implementation and the fallback path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from scda_tpu.core.boxes import bbox_overlaps

_NEG_INF = jnp.float32(-1e30)


class NmsResult(NamedTuple):
    indices: jnp.ndarray  # (max_output,) int32 indices into the input boxes
    valid: jnp.ndarray    # (max_output,) bool


def _default_impl() -> str:
    """Implementation default; SCDA_NMS_IMPL=lax|pallas overrides.

    Measured on one v5e chip (full VGG16 inference, 512x1024 canvas):
    the Pallas kernel wins in isolation (0.8 ms vs 7 ms on 6000->300
    adversarial boxes) but LOSES end-to-end (119 vs 159 img/s) — the
    pallas_call is a fusion/overlap barrier inside the jitted program,
    while the lax while_loop early-exits on realistic score
    distributions and overlaps with neighbouring ops.  Hence: lax by
    default everywhere; the kernel remains for explicit opt-in and for
    workloads dominated by standalone NMS calls."""
    import os

    return os.environ.get("SCDA_NMS_IMPL", "lax")


def _keep_mask_to_result(keep: jnp.ndarray, order: jnp.ndarray,
                         max_output: int) -> NmsResult:
    """(N,) keep mask over sorted boxes -> fixed-size NmsResult in the
    caller's (unsorted) index space, preserving score order."""
    kept_pos = jnp.nonzero(keep, size=max_output, fill_value=0)[0]
    count = jnp.sum(keep.astype(jnp.int32))
    slot = jnp.arange(max_output, dtype=jnp.int32)
    out_valid = slot < count
    out_idx = jnp.where(out_valid, jnp.take(order, kept_pos), 0)
    return NmsResult(indices=out_idx.astype(jnp.int32), valid=out_valid)


def _greedy_keep_tile(sup_matrix: jnp.ndarray, alive: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy keep inside one tile.

    sup_matrix: (T, T) bool, [i, j] True iff i < j and IoU(i, j) > thr.
    alive:      (T,) bool, candidates that survived cross-suppression.
    """
    tile = alive.shape[0]

    def cond(state):
        k, prev, it = state
        return jnp.logical_and(it < tile, jnp.any(k != prev))

    def body(state):
        k, _, it = state
        suppressed = jnp.any(k[:, None] & sup_matrix, axis=0)
        return alive & ~suppressed, k, it + 1

    k0 = alive
    # prev initialised to ~k0 guarantees at least one iteration.
    k, _, _ = lax.while_loop(cond, body, (k0, ~k0, jnp.int32(0)))
    return k


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    iou_threshold: float,
    max_output: int,
    valid: jnp.ndarray | None = None,
    tile_size: int = 512,
    impl: str | None = None,
    pre_sorted: bool = False,
) -> NmsResult:
    """Greedy NMS with fully static shapes.

    Args:
      boxes: (N, 4) float, (x1, y1, x2, y2).
      scores: (N,) float.
      iou_threshold: suppress boxes with IoU > threshold against a kept box.
      max_output: fixed number of outputs (ref post_nms_top_n).
      valid: optional (N,) bool mask; invalid boxes are ignored.
      tile_size: boxes processed per sequential step (512 measured
        fastest on v5e for both train- and test-size problems: half the
        sequential steps of 256 at still-tiny per-tile matrices).
      impl: "pallas" | "lax" | None (auto; SCDA_NMS_IMPL overrides).
      pre_sorted: the caller guarantees boxes are already in descending
        score order with invalid slots at the end (true straight out of
        ``lax.top_k``) — skips an O(N log N) re-sort (~1.6 ms at N=6000
        on v5e, 25% of the inference budget).

    Returns:
      NmsResult(indices (max_output,) int32, valid (max_output,) bool).
      Indices of invalid slots are 0 — always gate on the mask.
    """
    n = boxes.shape[0]
    boxes = boxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    if valid is not None:
        scores = jnp.where(valid, scores, _NEG_INF)

    # ---- sort by score (descending) --------------------------------------
    if pre_sorted:
        order = jnp.arange(n, dtype=jnp.int32)
        sboxes = boxes
        svalid = (
            valid if valid is not None else jnp.ones((n,), bool)
        )
    else:
        sorted_scores, order = lax.top_k(scores, n)
        sboxes = jnp.take(boxes, order, axis=0)
        svalid = sorted_scores > _NEG_INF * 0.5

    if (impl or _default_impl()) == "pallas":
        from scda_tpu.ops.pallas.nms_kernel import nms_sorted_pallas

        keep = nms_sorted_pallas(
            sboxes, svalid, iou_threshold=iou_threshold,
            max_output=max_output, tile_size=tile_size,
        )
        return _keep_mask_to_result(keep, order, max_output)

    # ---- pad to a tile multiple ------------------------------------------
    tile = int(tile_size)
    n_pad = (-n) % tile
    if n_pad:
        sboxes = jnp.concatenate(
            [sboxes, jnp.zeros((n_pad, 4), jnp.float32)], axis=0
        )
        svalid = jnp.concatenate([svalid, jnp.zeros((n_pad,), bool)], axis=0)
        order = jnp.concatenate([order, jnp.zeros((n_pad,), order.dtype)], axis=0)
    n_tiles = (n + n_pad) // tile

    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    )
    buf_slot = jax.lax.broadcasted_iota(jnp.int32, (max_output, 1), 0)[:, 0]

    def tile_step(state):
        t, count, kept_boxes, out_idx = state
        start = t * tile
        tboxes = lax.dynamic_slice(sboxes, (start, 0), (tile, 4))
        tvalid = lax.dynamic_slice(svalid, (start,), (tile,))
        torder = lax.dynamic_slice(order, (start,), (tile,))

        # (a) cross-suppression against the kept buffer.
        iou_prev = bbox_overlaps(tboxes, kept_boxes)  # (T, max_output)
        prev_mask = buf_slot[None, :] < count
        crossed = jnp.any((iou_prev > iou_threshold) & prev_mask, axis=1)
        alive = tvalid & ~crossed

        # (b) exact greedy within the tile.
        iou_tile = bbox_overlaps(tboxes, tboxes)
        keep = _greedy_keep_tile((iou_tile > iou_threshold) & tri, alive)

        # (c) append kept boxes to the buffer (masked scatter, OOB dropped).
        slots = count + jnp.cumsum(keep.astype(jnp.int32)) - keep.astype(jnp.int32)
        slots = jnp.where(keep, slots, max_output)  # drop non-kept
        kept_boxes = kept_boxes.at[slots].set(tboxes, mode="drop")
        out_idx = out_idx.at[slots].set(torder, mode="drop")
        new_count = jnp.minimum(
            count + jnp.sum(keep.astype(jnp.int32)), max_output
        )
        return t + 1, new_count, kept_boxes, out_idx

    def tile_cond(state):
        t, count, _, _ = state
        return jnp.logical_and(t < n_tiles, count < max_output)

    init = (
        jnp.int32(0),
        jnp.int32(0),
        jnp.zeros((max_output, 4), jnp.float32),
        jnp.zeros((max_output,), jnp.int32),
    )
    _, count, _, out_idx = lax.while_loop(tile_cond, tile_step, init)

    out_valid = buf_slot < count
    out_idx = jnp.where(out_valid, out_idx, 0)
    return NmsResult(indices=out_idx, valid=out_valid)


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    iou_threshold: float,
    max_output: int,
    valid: jnp.ndarray | None = None,
    tile_size: int = 512,
    impl: str | None = None,
    pre_sorted: bool = False,
) -> NmsResult:
    """NMS over a leading batch (or class) dimension.

    Replaces the reference's per-class Python loop at test time
    (ref test_net.py:~180: ``for j in range(1, num_classes): ... nms(...)``)
    with one call.  The lax path vmaps; the pallas path feeds the batch
    dimension straight into the kernel's (batch, tiles) grid — vmapping
    pallas_call would re-index program_id and break its sequential-
    scratch state.
    """
    if valid is None:
        valid = jnp.ones(scores.shape, bool)

    if (impl or _default_impl()) == "pallas":
        from scda_tpu.ops.pallas.nms_kernel import nms_sorted_pallas

        if pre_sorted:
            b, n = scores.shape
            order = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
            sboxes = boxes.astype(jnp.float32)
            svalid = valid
        else:
            scores_m = jnp.where(valid, scores.astype(jnp.float32),
                                 _NEG_INF)
            sorted_scores, order = lax.top_k(scores_m, scores.shape[-1])
            sboxes = jnp.take_along_axis(
                boxes.astype(jnp.float32), order[..., None], axis=1
            )
            svalid = sorted_scores > _NEG_INF * 0.5
        keep = nms_sorted_pallas(
            sboxes, svalid, iou_threshold=iou_threshold,
            max_output=max_output, tile_size=tile_size,
        )
        return jax.vmap(
            lambda k, o: _keep_mask_to_result(k, o, max_output)
        )(keep, order)

    fn = lambda b, s, v: nms(
        b,
        s,
        iou_threshold=iou_threshold,
        max_output=max_output,
        valid=v,
        tile_size=tile_size,
        impl="lax",
        pre_sorted=pre_sorted,
    )
    return jax.vmap(fn)(boxes, scores, valid)
