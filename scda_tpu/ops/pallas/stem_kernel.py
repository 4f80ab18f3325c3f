"""Fused VGG stem (conv1_1 + relu + conv1_2 + relu + 2x2 maxpool) — Pallas TPU.

Why this exists (r3 bs=8 serving profile, RESULTS.md): the stem region
dominated the non-conv2-5 time — XLA spent ~17 ms of a 40 ms step on the
full-resolution 64-channel stage: the stacked-27 patch concat wrote a
226 MB HBM tensor (3.1 ms), conv1_2's lowering forced TWO pure layout
copies of the 512 MB activation ({2,3,1,0}<->{3,0,2,1}, 4.9 ms), and
conv1_2 / relu / pool1 each re-streamed it (4.4 / 1.6 / 1.7 ms).  All of
that is HBM traffic on an intermediate that fits in VMEM one row-tile at
a time.

This kernel streams the image once and writes only the pooled stride-2
output: per (image, row-tile) grid step it
  1. builds the 27-channel tap stack per row IN VMEM (lane-shifted
     zero-fill slices — zero padding semantics fall out of the shifts),
  2. contracts (27, W) x (27, 64) on the MXU (conv1_1), bias+relu,
     masking rows that hang over the image border,
  3. keeps y1 (row_tile+2, W, 64) in VMEM scratch,
  4. per output row concatenates the nine shifted y1 taps to (W, 576)
     and contracts against (576, 64) — one dense K=576 MXU matmul per
     row instead of a degenerate 64-channel convolution,
  5. maxpools 2x2 in-register and writes the (row_tile/2, W/2, 64)
     channel-last block.

HBM traffic per image drops from ~5 full-res tensors (~2.5 GB at bs=8)
to one image read (12 MB) + one pooled write (128 MB at bs=8).

Gradients: conv1_1/conv1_2 are frozen in every supported config (ref
vgg16.py:~50 "Fix the layers before conv3"; frozen_param_mask), and the
image carries no gradient, so the caller wraps the result in
stop_gradient — no backward kernel is needed.  The invariant is
enforced at step-build time: ``train/steps.py:check_train_config``
rejects ``stem_pallas`` with ``freeze_pretrained_layers=false`` (and
``cli/trainval.py`` auto-disables the stem for that combination).

Reference lineage: lib/model/faster_rcnn/vgg16.py:~40 (torchvision
features[0..4]); semantics oracle-tested against lax.conv in
tests/test_stem_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Conservative VMEM budget for the gate (v5e TensorCore VMEM is ~16 MiB;
# leave headroom for Mosaic's own buffers).  Measured: 512x1024 th=8
# needs ~11 MB and compiles; th=16/32 and 1024x2048 exceed it and fail
# Mosaic compile — the gate must fall back BEFORE that (the config
# contract promises auto-fallback on unsupported shapes).
_VMEM_BUDGET_BYTES = 12 * 2**20


def _vmem_bytes(h: int, w: int, c_in: int, c_out: int,
                row_tile: int) -> int:
    """Footprint estimate: double-buffered image + output blocks, plus
    the 3-variant y1 scratch (all bf16)."""
    img = c_in * (h + 4) * w * 2
    scratch = 3 * (row_tile + 2) * w * c_out * 2
    out = (row_tile // 2) * (w // 2) * c_out * 2
    return 2 * img + scratch + 2 * out


def supported(h: int, w: int, c_in: int, c_out: int,
              row_tile: int) -> bool:
    """Shape gate: row tiling must divide H; W must be sublane-clean
    (multiple of 8) and even for the 2x2 pool; the working set must fit
    the VMEM budget (huge canvases fall back to the einsum stem)."""
    return (
        c_in == 3 and c_out == 64
        and row_tile % 2 == 0
        and h % row_tile == 0
        and w % 8 == 0 and w % 2 == 0
        and _vmem_bytes(h, w, c_in, c_out, row_tile) <= _VMEM_BUDGET_BYTES
    )


def _shift(a: jnp.ndarray, dx: int, axis: int) -> jnp.ndarray:
    """out[.., i, ..] = a[.., i+dx, ..] along ``axis``, zero-filled.

    Mosaic rejects lane/sublane concatenates at a 1-element offset
    ("offset mismatch on non-concat dimension"), so the shift is a
    rotate + border mask instead.
    """
    if dx == 0:
        return a
    size = a.shape[axis]
    # Mosaic only implements 32-bit rotates — round-trip through f32.
    rolled = pltpu.roll(a.astype(jnp.float32), (-dx) % size, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    keep = idx < size - dx if dx > 0 else idx >= -dx
    return jnp.where(keep, rolled, 0.0).astype(a.dtype)


def _stem_kernel(img_ref, w1_ref, w2_ref, b1_ref, b2_ref, out_ref,
                 y1_ref, *, th, height, width, cdtype):
    i = pl.program_id(1)
    r0 = i * th
    # Padded-image rows [r0, r0+th+4) == original rows [r0-2, r0+th+2).
    blk = img_ref[0, :, pl.ds(r0, th + 4), :]            # (3, th+4, W)

    # conv1_1 -> y1 rows r0-1 .. r0+th+1 (the +-1 halo conv1_2 needs).
    for r in range(th + 2):
        taps = []
        for dy in range(3):
            row3 = blk[:, r + dy, :]                     # (3, W)
            for dx in (-1, 0, 1):
                taps.append(_shift(row3, dx, axis=1))    # W in lanes
        x27 = jnp.concatenate(taps, axis=0)              # (27, W)
        # (27, W)^T x (27, 64) -> (W, 64): sublane contraction is the
        # MXU-native lhsT orientation.
        y = jax.lax.dot_general(
            x27, w1_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = jnp.maximum(y + b1_ref[0], 0.0)
        # Rows hanging over the image border must be ZERO for conv1_2's
        # zero padding (the padded image alone would give relu(b1)).
        g = r0 - 1 + r
        valid = jnp.logical_and(g >= 0, g < height)
        y1 = jnp.where(valid, y, 0.0)                    # f32: rolls are
        # 32-bit native, so shifting BEFORE the bf16 store avoids the
        # f32<->bf16 round-trip inside _shift.  Store the three
        # dx-shifted variants ONCE per y1 row (2 rolls) instead of
        # re-rolling per consuming output row (was 6 rolls per output
        # row — the rolls were ~2/5 of kernel time).
        for d, dx in enumerate((-1, 0, 1)):
            y1_ref[d, r] = _shift(y1, dx, axis=0).astype(cdtype)

    # conv1_2 + relu + 2x2 pool, one output-row PAIR at a time.
    for q in range(th // 2):
        pair = []
        for rr in (2 * q, 2 * q + 1):
            ys = [y1_ref[d, rr + dy]                     # (W, 64)
                  for dy in range(3) for d in range(3)]
            cat = jnp.concatenate(ys, axis=1)            # (W, 576)
            acc = jnp.dot(cat, w2_ref[...],
                          preferred_element_type=jnp.float32)
            pair.append(jnp.maximum(acc + b2_ref[0], 0.0))
        m = jnp.maximum(pair[0], pair[1])                # row pool
        # Column pool: W sits in the sublane dim; pairwise max via the
        # (W/2, 2, 64) split (sublane-granular, no lane relayout).
        m = m.reshape(width // 2, 2, 64)
        out_ref[0, q] = jnp.max(m, axis=1).astype(cdtype)


def vgg_stem_fused(
    x: jnp.ndarray,        # (B, H, W, 3) float, mean-subtracted BGR
    k1: jnp.ndarray,       # (3, 3, 3, 64)  HWIO
    b1: jnp.ndarray,       # (64,)
    k2: jnp.ndarray,       # (3, 3, 64, 64) HWIO
    b2: jnp.ndarray,       # (64,)
    *,
    row_tile: int = 8,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """relu(conv3x3(relu(conv3x3(x)@k1), k2)) -> maxpool2x2, fused.

    Returns (B, H//2, W//2, 64) in ``dtype``.  Matmul semantics match
    the einsum stem (bf16 inputs, f32 accumulation).

    Data-parallel safe: the call is wrapped in ``custom_partitioning``
    with a batch-axis rule — under pjit with the batch sharded over a
    ``('data',)`` mesh each chip runs the kernel on its local shard.
    Without the rule GSPMD has no partitioning for a Mosaic custom
    call and REPLICATES it (measured: 30 all-gathers — every chip
    would fetch the full global-batch full-res image over ICI).
    """
    return _partitioned_stem(row_tile, jnp.dtype(dtype).name, interpret)(
        x, k1, b1, k2, b2)


@functools.lru_cache(maxsize=None)
def _partitioned_stem(row_tile: int, dtype_name: str, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    dtype = jnp.dtype(dtype_name)

    def impl(x, k1, b1, k2, b2):
        return _stem_call(x, k1, b1, k2, b2, row_tile=row_tile,
                          dtype=dtype, interpret=interpret)

    cp = custom_partitioning(impl)

    def _batch_axis(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def infer_sharding(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_batch_axis(arg_shapes)))

    def partition(mesh, arg_shapes, result_shape):
        batch = _batch_axis(arg_shapes)
        arg_shardings = (NamedSharding(mesh, P(batch)),) + tuple(
            NamedSharding(mesh, P()) for _ in range(4))
        return mesh, impl, NamedSharding(mesh, P(batch)), arg_shardings

    # Shardy rule: only the batch factor propagates; spatial/channel/
    # weight factors must stay unsharded (the kernel owns full H, W).
    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule="b h w c, i j k o, e, p q r s, f -> b m n d",
        need_replication_factors=(
            "h", "w", "c", "i", "j", "k", "o", "e",
            "p", "q", "r", "s", "f", "m", "n", "d",
        ),
    )
    return cp


def _stem_call(
    x: jnp.ndarray,
    k1: jnp.ndarray,
    b1: jnp.ndarray,
    k2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    row_tile: int,
    dtype,
    interpret: bool,
) -> jnp.ndarray:
    """Unpartitioned body: prep + pallas_call on (local) shapes."""
    b, h, w, c_in = x.shape
    c_out = k1.shape[-1]
    th = row_tile
    assert supported(h, w, c_in, c_out, th), (x.shape, th)

    xcf = jnp.transpose(x.astype(dtype), (0, 3, 1, 2))   # (B, 3, H, W)
    xcf = jnp.pad(xcf, ((0, 0), (0, 0), (2, 2), (0, 0)))
    # Tap-major weight packing matches the kernel's concat order:
    # channel (dy*3 + dx)*C + c  <->  k[dy, dx, c, :] (row-major).
    w1 = k1.reshape(9 * c_in, c_out).astype(dtype)
    w2 = k2.reshape(9 * c_out, c_out).astype(dtype)
    b1r = jnp.asarray(b1, jnp.float32).reshape(1, c_out)
    b2r = jnp.asarray(b2, jnp.float32).reshape(1, c_out)

    grid = (b, h // th)
    out = pl.pallas_call(
        functools.partial(_stem_kernel, th=th, height=h, width=w,
                          cdtype=dtype),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c_out), dtype),
        grid=grid,
        in_specs=[
            # Whole padded image per batch element; the index map is
            # constant over the row-tile axis, so it is fetched once.
            pl.BlockSpec((1, c_in, h + 4, w), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c_in, c_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c_out, c_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th // 2, w // 2, c_out), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3, th + 2, w, c_out), dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c_out * (9 * c_in + 9 * c_out),
            bytes_accessed=(b * h * w * c_in * 2
                            + b * (h // 2) * (w // 2) * c_out * 2),
            transcendentals=0,
        ),
    )(xcf, w1, w2, b1r, b2r)
    return out
