"""Fused ResNet bottleneck chain (N identity blocks) — Pallas TPU.

Why this exists (r4 prefix ledger, RESULTS.md): the res101 trunk runs at
~29% MFU — bottleneck stages alternate tiny-FLOP 1x1 convs whose
activation read/write traffic dominates their arithmetic.  At the
production canvas the stride-16 layer3 map is (32, 64, 1024) = 4 MB
bf16, i.e. the ENTIRE residual stream fits in VMEM — yet XLA streams it
to HBM after every conv/bn/relu/add: ~20 MB of traffic per block, 23
blocks, plus layout copies.

This kernel keeps the residual stream VMEM-resident across all N
stride-1 identity blocks of a stage and streams only the per-block
weights: grid (batch, block), the out block revisited at a constant
index so it lives in VMEM for the whole chain; per block it

  1. contracts (HW, C) x (C, F) on the MXU (the 1x1 reduce), bias+relu
     into a bf16 scratch,
  2. computes the 3x3 as nine (HW, F) x (F, F) matmuls; spatial shifts
     are applied to the PRODUCT (shift-then-matmul == matmul-then-shift
     along the position axis) as sublane rolls + border masks — zero
     padding falls out of the masks,
  3. contracts back (HW, F) x (F, C) in C-chunks (bounding the f32
     transient), adds the residual in place, relu.

FrozenBatchNorm is a constant affine in every supported config (ref
resnet.py:~290, always-eval BN), so each bn folds into its conv's
effective weight + bias (:func:`fold_bottleneck_params`) — the kernel
sees plain matmul weights.

HBM traffic for layer3 at the production canvas drops from ~460 MB per
image to one map read (4 MB) + weights (50 MB) + one map write (4 MB).

Gradients: unlike the frozen VGG stem, layer3 trains (fixed_blocks=1
freezes layer1 only), so the op carries a ``custom_vjp`` whose backward
re-derives the chain with plain XLA ops (:func:`chain_reference`) and
differentiates that — rematerialization semantics, identical cost to
the unfused backward.

Reference lineage: lib/model/faster_rcnn/resnet.py:~100 (Bottleneck,
torchvision layout); oracle-tested against the Flax stage in
tests/test_bottleneck_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e TensorCore VMEM is ~16 MiB.  Peak residency here: out block (the
# residual stream) + double-buffered weights + y1 scratch + f32
# transients (one (HW, F) matmul product + the 3x3 accumulator, and in
# phase 3 one C-chunk product + residual chunk).  The layer3 production
# shape (HW=2048, C=1024, F=256) lands at ~14.5 MB and compiles; the
# gate must reject anything bigger BEFORE Mosaic fails.
_VMEM_BUDGET_BYTES = 15 * 2**20

_C_CHUNK = 256  # phase-3 output chunking (bounds the f32 transient)


def _vmem_bytes(hw: int, c: int, f: int) -> int:
    out_blk = hw * c * 2
    weights = 2 * 2 * (c * f + 9 * f * f + f * c)  # double-buffered bf16
    y1 = hw * f * 2
    # Phase 2 (product + accumulator) and phase 3 (chunk product +
    # residual chunk) transients are not simultaneously live.
    transients = max(2 * hw * f * 4, 2 * hw * min(c, _C_CHUNK) * 4)
    return out_blk + weights + y1 + transients


def supported(h: int, w: int, c: int, f: int) -> bool:
    """Shape gate: channel dims must be lane-aligned, the flattened map
    sublane-aligned for bf16, and the working set must fit VMEM.
    (Production layer3: h=32..64, w=32..64, c=1024, f=256 -> ~14.5 MB.)"""
    hw = h * w
    return (
        c % 128 == 0 and f % 128 == 0
        and c % _C_CHUNK == 0
        and hw % 16 == 0
        and w >= 2 and h >= 2
        and _vmem_bytes(hw, c, f) <= _VMEM_BUDGET_BYTES
    )


def _chain_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  out_ref, y1_ref, sem, *, h, w, c, f, cdtype):
    hw = h * w
    bi = pl.program_id(0)

    # Load the input map straight into the out block (the residual
    # stream) once per image; blocks n>0 chain off the previous write.
    @pl.when(pl.program_id(1) == 0)
    def _():
        dma = pltpu.make_async_copy(x_ref.at[bi], out_ref.at[0], sem)
        dma.start()
        dma.wait()

    res = out_ref[0]                                    # (HW, C) bf16

    # 1x1 reduce + bn1 + relu.
    y = jax.lax.dot_general(
        res, w1_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y1_ref[...] = jnp.maximum(y + b1_ref[0], 0.0).astype(cdtype)
    y1 = y1_ref[...]

    # 3x3 + bn2 + relu.  out[p] = sum_s y1[p + s] @ K_s with
    # s = dy*W + dx; the shift commutes with the position-wise matmul,
    # so roll the PRODUCT (f32 — Mosaic rolls are 32-bit native) and
    # mask source positions that fall outside the map (zero padding).
    pos = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0)
    row = pos // w
    col = pos % w
    acc = jnp.zeros((hw, f), jnp.float32)
    for k in range(9):
        dy, dx = k // 3 - 1, k % 3 - 1
        p = jnp.dot(y1, w2_ref[0, k], preferred_element_type=jnp.float32)
        s = dy * w + dx
        if s:
            p = pltpu.roll(p, (-s) % hw, 0)
        valid = jnp.logical_and(
            jnp.logical_and(row + dy >= 0, row + dy < h),
            jnp.logical_and(col + dx >= 0, col + dx < w),
        )
        acc = acc + jnp.where(valid, p, 0.0)
    y2 = jnp.maximum(acc + b2_ref[0], 0.0).astype(cdtype)

    # 1x1 expand + bn3 + residual + relu, in C-chunks so the f32
    # product transient stays bounded.  In-place on the out block.
    for j in range(c // _C_CHUNK):
        sl = slice(j * _C_CHUNK, (j + 1) * _C_CHUNK)
        prod = jax.lax.dot_general(
            y2, w3_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        r = out_ref[0, :, sl].astype(jnp.float32)
        out_ref[0, :, sl] = jnp.maximum(
            r + prod + b3_ref[0, :, sl], 0.0).astype(cdtype)


def _chain_call(x, w1, b1, w2, b2, w3, b3, *, dtype, interpret):
    """Unpartitioned body: (B, H, W, C) in/out, weights stacked (N, ...)."""
    b, h, w, c = x.shape
    n, _, f = w1.shape
    hw = h * w
    assert supported(h, w, c, f), (x.shape, f)

    xf = x.astype(dtype).reshape(b, hw, c)
    out = pl.pallas_call(
        functools.partial(_chain_kernel, h=h, w=w, c=c, f=f, cdtype=dtype),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), dtype),
        grid=(b, n),
        in_specs=[
            # Full input stays off-chip; copied into the out block once
            # per image by the kernel itself (saves a 2nd HW x C buffer).
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, c, f), lambda bi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f), lambda bi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, f, f), lambda bi, ni: (ni, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f), lambda bi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, c), lambda bi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Constant index over the block axis: the residual stream lives
        # in VMEM across the whole chain, flushed once per image.
        out_specs=pl.BlockSpec((1, hw, c), lambda bi, ni: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hw, f), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * hw * (2 * c * f + 9 * f * f),
            bytes_accessed=(2 * b * hw * c * 2
                            + n * 2 * (2 * c * f + 9 * f * f)),
            transcendentals=0,
        ),
    )(xf, w1.astype(dtype), b1, w2.astype(dtype), b2,
      w3.astype(dtype), b3)
    return out.reshape(b, h, w, c)


def chain_reference(x, w1, b1, w2, b2, w3, b3, *, dtype=jnp.bfloat16):
    """Pure-XLA chain with the kernel's matmul semantics (bf16 inputs,
    f32 accumulation, bf16 after every stage).  Used as the custom_vjp
    backward (remat) and as the CPU/unsupported-shape fallback."""
    n = w1.shape[0]
    x = x.astype(dtype)
    for i in range(n):
        y1 = jax.lax.dot_general(
            x, w1[i].astype(dtype), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y1 = jnp.maximum(y1 + b1[i, 0], 0.0).astype(dtype)
        k2 = w2[i].reshape(3, 3, *w2.shape[2:]).astype(dtype)
        y2 = jax.lax.conv_general_dilated(
            y1, k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y2 = jnp.maximum(y2 + b2[i, 0], 0.0).astype(dtype)
        y3 = jax.lax.dot_general(
            y2, w3[i].astype(dtype), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = jnp.maximum(y3 + b3[i, 0] + x.astype(jnp.float32),
                        0.0).astype(dtype)
    return x


def fold_bottleneck_params(blocks, eps: float = 1e-5):
    """Fold each block's FrozenBatchNorm affines into its conv weights.

    ``blocks``: per-block param dicts with the Flax Bottleneck tree
    ({conv1:{kernel}, bn1:{scale,bias,mean,var}, conv2, bn2, conv3, bn3}).
    Returns f32 stacks (w1 (N,C,F), b1 (N,1,F), w2 (N,9,F,F), b2 (N,1,F),
    w3 (N,F,C), b3 (N,1,C)).  Differentiable — gradients flow back to the
    raw conv kernels (bn params are optimizer-masked anyway)."""

    def fold(kernel, bn):
        mult = bn["scale"] / jnp.sqrt(bn["var"] + eps)
        add = bn["bias"] - bn["mean"] * mult
        return kernel * mult, add[None, :]

    outs = ([], [], [], [], [], [])
    for blk in blocks:
        w1, a1 = fold(blk["conv1"]["kernel"][0, 0], blk["bn1"])
        w2, a2 = fold(blk["conv2"]["kernel"], blk["bn2"])
        w3, a3 = fold(blk["conv3"]["kernel"][0, 0], blk["bn3"])
        f = w2.shape[-1]
        for lst, v in zip(outs, (w1, a1, w2.reshape(9, f, f), a2, w3, a3)):
            lst.append(v)
    return tuple(jnp.stack(lst) for lst in outs)


def bottleneck_chain(x, w1, b1, w2, b2, w3, b3, *,
                     dtype=jnp.bfloat16, interpret: bool = False):
    """N fused stride-1 identity bottlenecks over a VMEM-resident map.

    x: (B, H, W, C); weights from :func:`fold_bottleneck_params`.
    Returns (B, H, W, C) in ``dtype``.  Differentiable (backward remats
    via :func:`chain_reference`).  Data-parallel safe: batch-axis
    ``custom_partitioning`` rule, same rationale as the fused stem
    (without it GSPMD replicates Mosaic calls — measured all-gathers).
    """
    return _chain_fn(jnp.dtype(dtype).name, interpret)(
        x, w1, b1, w2, b2, w3, b3)


@functools.lru_cache(maxsize=None)
def _chain_fn(dtype_name: str, interpret: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    dtype = jnp.dtype(dtype_name)

    def impl(x, w1, b1, w2, b2, w3, b3):
        return _chain_call(x, w1, b1, w2, b2, w3, b3,
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
            NamedSharding(mesh, P()) for _ in range(6))
        return mesh, impl, NamedSharding(mesh, P(batch)), arg_shardings

    # Shardy rule: only the batch factor propagates; the kernel owns the
    # full map and all weight axes.
    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding,
        sharding_rule=("b h w c, d e f, g i j, k l m n, o p q, "
                       "r s t, u v y -> b h w c"),
        need_replication_factors=(
            "h", "w", "c", "d", "e", "f", "g", "i", "j", "k", "l",
            "m", "n", "o", "p", "q", "r", "s", "t", "u", "v", "y",
        ),
    )

    @jax.custom_vjp
    def fn(x, w1, b1, w2, b2, w3, b3):
        return cp(x, w1, b1, w2, b2, w3, b3)

    def fwd(x, *ws):
        return fn(x, *ws), (x, ws)

    def bwd(resids, g):
        # Remat in UNIFORM f32: values enter bf16-rounded (.astype(dtype)
        # then up) so the linearization point matches the kernel forward,
        # but every transpose sees one dtype — conv_general_dilated's
        # transpose rejects bf16 operands against the f32 cotangent that
        # preferred_element_type=f32 produces (caught by dryrun_multichip
        # phase 2: bf16 train step through the chain).  Per-stage rounding
        # inside the remat is dropped; that noise is far below the bf16
        # gradient noise custom_vjp already accepts.
        x, ws = resids

        def up(t):
            return t.astype(dtype).astype(jnp.float32)

        _, vjp = jax.vjp(
            lambda xx, *ww: chain_reference(xx, *ww, dtype=jnp.float32),
            up(x), *(up(w) for w in ws))
        grads = vjp(g.astype(jnp.float32))
        return (grads[0].astype(x.dtype),) + tuple(
            gw.astype(w.dtype) for gw, w in zip(grads[1:], ws))

    fn.defvjp(fwd, bwd)
    return fn
