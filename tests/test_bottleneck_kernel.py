"""Fused Pallas bottleneck chain (ops/pallas/bottleneck_kernel.py) vs the
Flax ResNet stage oracle, plus backbone wiring (param-tree identity) and
gradient parity of the custom_vjp remat backward.

The kernel replaces the stride-1 identity tail of a ResNet stage (ref
lib/model/faster_rcnn/resnet.py:~100, torchvision Bottleneck layout) with
one VMEM-resident pass; semantics must match the composed conv/frozen-BN/
relu/residual ops (zero padding at borders included).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scda_tpu.models.backbones.resnet import (
    Bottleneck, ResNetBackbone, ResNetStage)
from scda_tpu.ops.pallas import bottleneck_kernel as bk


def _chain_weights(rng, n, c, f, scale=0.08):
    """Random folded-weight stacks (already past BN folding)."""
    return (
        jnp.asarray(rng.randn(n, c, f).astype(np.float32) * scale),
        jnp.asarray(rng.randn(n, 1, f).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(n, 9, f, f).astype(np.float32) * scale),
        jnp.asarray(rng.randn(n, 1, f).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(n, f, c).astype(np.float32) * scale),
        jnp.asarray(rng.randn(n, 1, c).astype(np.float32) * 0.1),
    )


def _stage_params(rng, n_identity, c, f, scale=0.05):
    """Flax-tree params for n identity Bottlenecks with random BN stats
    (exercises the folding, not just the matmul path)."""
    blocks = []
    for _ in range(n_identity):
        def bn(ch):
            return {
                "scale": jnp.asarray(1.0 + 0.1 * rng.randn(ch).astype(
                    np.float32)),
                "bias": jnp.asarray(0.1 * rng.randn(ch).astype(np.float32)),
                "mean": jnp.asarray(0.1 * rng.randn(ch).astype(np.float32)),
                "var": jnp.asarray(
                    (1.0 + 0.1 * rng.rand(ch)).astype(np.float32)),
            }
        blocks.append({
            "conv1": {"kernel": jnp.asarray(
                rng.randn(1, 1, c, f).astype(np.float32) * scale)},
            "bn1": bn(f),
            "conv2": {"kernel": jnp.asarray(
                rng.randn(3, 3, f, f).astype(np.float32) * scale)},
            "bn2": bn(f),
            "conv3": {"kernel": jnp.asarray(
                rng.randn(1, 1, f, c).astype(np.float32) * scale)},
            "bn3": bn(c),
        })
    return blocks


class TestChainKernel:
    @pytest.mark.parametrize("shape", [(2, 4, 8), (1, 8, 4), (1, 2, 16)])
    def test_matches_reference_f32(self, rng, shape):
        b, h, w = shape
        f = 128
        c = 4 * f
        x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.5)
        ws = _chain_weights(rng, 3, c, f)
        ref = bk.chain_reference(x, *ws, dtype=jnp.float32)
        out = bk.bottleneck_chain(x, *ws, dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_border_zero_padding_semantics(self, rng):
        """Constant input map: interior vs border rows/cols differ exactly
        as the 3x3 zero padding dictates — catches roll/mask bugs."""
        f = 128
        c = 4 * f
        h, w = 4, 8
        x = jnp.ones((1, h, w, c), jnp.float32)
        ws = _chain_weights(rng, 1, c, f)
        ref = bk.chain_reference(x, *ws, dtype=jnp.float32)
        out = bk.bottleneck_chain(x, *ws, dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        # The oracle itself must show border structure (guards against a
        # vacuously-uniform fixture).
        r = np.asarray(ref)[0]
        assert not np.allclose(r[0, 0], r[h // 2, w // 2])

    def test_matches_flax_stage_with_bn_folding(self, rng):
        """End-to-end vs the real Flax Bottleneck sequence: fold random
        BN stats, run the kernel, compare against the module stack."""
        f = 128
        c = 4 * f
        x = jnp.asarray(rng.randn(1, 4, 8, c).astype(np.float32) * 0.5)
        blocks = _stage_params(rng, 2, c, f)
        ws = bk.fold_bottleneck_params(blocks)
        out = bk.bottleneck_chain(x, *ws, dtype=jnp.float32, interpret=True)

        ref = x
        for blk in blocks:
            mod = Bottleneck(f, dtype=jnp.float32)
            params = {
                "conv1": blk["conv1"], "bn1": blk["bn1"],
                "conv2": blk["conv2"], "bn2": blk["bn2"],
                "conv3": blk["conv3"], "bn3": blk["bn3"],
            }
            ref = mod.apply({"params": params}, ref)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_custom_vjp_matches_reference_grads(self, rng):
        """The remat backward must equal autodiff through the reference
        chain — in f32 interpret mode the two are numerically identical
        up to reduction order."""
        f = 128
        c = 4 * f
        x = jnp.asarray(rng.randn(1, 2, 16, c).astype(np.float32) * 0.5)
        ws = _chain_weights(rng, 2, c, f)

        def loss_kernel(x, *ws):
            out = bk.bottleneck_chain(x, *ws, dtype=jnp.float32,
                                      interpret=True)
            return jnp.sum(out ** 2)

        def loss_ref(x, *ws):
            return jnp.sum(
                bk.chain_reference(x, *ws, dtype=jnp.float32) ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 3, 5))(x, *ws)
        gr = jax.grad(loss_ref, argnums=(0, 1, 3, 5))(x, *ws)
        # The cotangent entering bwd is 2*out_KERNEL vs 2*out_REF — the
        # primal pair differ by ~1e-7, so allow that amplified noise.
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)

    def test_custom_vjp_bf16_trains(self, rng):
        """bf16 grads through the chain must (a) not crash — the conv
        transpose rejects mixed bf16/f32 operands, which the uniform-f32
        remat avoids (bug caught by dryrun_multichip phase 2) — and
        (b) track the f32 reference grads to bf16 tolerance."""
        f = 128
        c = 4 * f
        x = jnp.asarray(rng.randn(1, 2, 16, c).astype(np.float32) * 0.5
                        ).astype(jnp.bfloat16)
        ws = _chain_weights(rng, 2, c, f)

        def loss_kernel(x, *ws):
            out = bk.bottleneck_chain(x, *ws, dtype=jnp.bfloat16,
                                      interpret=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_ref(x, *ws):
            out = bk.chain_reference(x.astype(jnp.float32), *ws,
                                     dtype=jnp.float32)
            return jnp.sum(out ** 2)

        gk = jax.grad(loss_kernel, argnums=(1, 3, 5))(x, *ws)
        gr = jax.grad(loss_ref, argnums=(1, 3, 5))(x, *ws)
        for a, b in zip(gk, gr):
            assert a.dtype == b.dtype == jnp.float32
            scale = np.abs(np.asarray(b)).max() + 1e-6
            err = np.abs(np.asarray(a) - np.asarray(b)) / scale
            # Quantile bound, not a global atol: a relu whose f32
            # pre-activation sits within bf16 rounding of zero flips
            # state between the two forwards, making a handful of grad
            # elements locally wrong by O(activation) — unbounded by any
            # small atol, but measured at ~1e-5 of elements.
            assert np.mean(err <= 0.05) >= 0.999, (
                f"{np.mean(err > 0.05):.2e} of elements exceed 0.05")
            assert err.max() <= 0.5, err.max()

    def test_sharded_batch_partitions_without_allgather(self, rng):
        """Under pjit with the batch sharded over the 8-device mesh the
        custom_partitioning rule must run the kernel on local shards —
        no all-gather of the feature map (GSPMD's default for an unruled
        Mosaic custom call) — and match the unsharded result."""
        import functools

        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())

        f = 128
        c = 4 * f
        x = jnp.asarray(rng.randn(8, 4, 8, c).astype(np.float32) * 0.5)
        ws = _chain_weights(rng, 2, c, f)
        fn = functools.partial(bk.bottleneck_chain, dtype=jnp.float32,
                               interpret=True)
        jf = jax.jit(fn, in_shardings=(data,) + (repl,) * 6,
                     out_shardings=data)
        hlo = jf.lower(x, *ws).compile().as_text()
        assert "all-gather" not in hlo
        out = np.asarray(jf(x, *ws))
        ref = np.asarray(fn(x, *ws))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_supported_gate(self):
        # Production layer3 (both canvas orientations) must pass.
        assert bk.supported(32, 64, 1024, 256)
        assert bk.supported(64, 32, 1024, 256)
        # Stride-8 layer2 map blows VMEM; layer1's f=64 is lane-misaligned.
        assert not bk.supported(64, 128, 512, 128)
        assert not bk.supported(128, 256, 256, 64)


class TestBackboneWiring:
    def test_param_tree_identity(self, rng):
        """chain_pallas must not change the param tree (checkpoints and
        the torch converter depend on it).  On CPU the fused branch is
        never taken, so compare init trees with the flag on vs off."""
        x = jnp.zeros((1, 32, 64, 3), jnp.float32)
        p_on = ResNetBackbone(depth=50, dtype=jnp.float32,
                              chain_pallas=True).init(
            jax.random.PRNGKey(0), x)
        p_off = ResNetBackbone(depth=50, dtype=jnp.float32,
                               chain_pallas=False).init(
            jax.random.PRNGKey(0), x)
        flat_on = jax.tree_util.tree_leaves_with_path(p_on)
        flat_off = jax.tree_util.tree_leaves_with_path(p_off)
        assert [k for k, _ in flat_on] == [k for k, _ in flat_off]
        for (_, a), (_, b) in zip(flat_on, flat_off):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_stage_fused_branch_interpret(self, rng, monkeypatch):
        """Force the fused branch on CPU (interpret mode, bf16 — the real
        gate conditions) and compare the whole stage, including block0 and
        the BN folding, against the unfused module path."""
        from scda_tpu.ops.pallas import bottleneck_kernel

        def chain_interp(x, *ws, dtype=jnp.bfloat16, interpret=False):
            return bottleneck_kernel._chain_fn(
                jnp.dtype(dtype).name, True)(x, *ws)

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(bottleneck_kernel, "bottleneck_chain",
                            chain_interp)

        f = 128
        c = 4 * f
        x = jnp.asarray(rng.randn(1, 8, 16, c).astype(np.float32) * 0.5)
        params = ResNetStage(f, 3, 1, dtype=jnp.bfloat16,
                             chain_pallas=False).init(
            jax.random.PRNGKey(1), x)
        ref = ResNetStage(f, 3, 1, dtype=jnp.bfloat16,
                          chain_pallas=False).apply(params, x)
        out = ResNetStage(f, 3, 1, dtype=jnp.bfloat16,
                          chain_pallas=True).apply(params, x)
        # Init down the FUSED branch must produce the identical tree AND
        # values (flax RNG folds by param path, which the twins preserve).
        p_fused = ResNetStage(f, 3, 1, dtype=jnp.bfloat16,
                              chain_pallas=True).init(
            jax.random.PRNGKey(1), x)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(params),
                jax.tree_util.tree_leaves_with_path(p_fused)):
            assert ka == kb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # bf16 path tolerance: folding reorders the conv->affine rounding.
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=0.06, atol=0.06)

    def test_stage_fold_comparison_f32_tight(self, rng):
        """f32 variant of the stage-level fold comparison: pins the BN
        folding itself at ~1e-4, independent of the bf16 rounding noise
        the 0.06-tolerance test above must allow (a systematic folding
        bias — wrong eps, accumulation-order bug — would hide there)."""
        f = 128
        c = 4 * f
        x = jnp.asarray(rng.randn(1, 8, 16, c).astype(np.float32) * 0.5)
        stage = ResNetStage(f, 3, 1, dtype=jnp.float32, chain_pallas=False)
        params = stage.init(jax.random.PRNGKey(1), x)
        ref = stage.apply(params, x)

        # Fused-path equivalent by hand (the module gate requires bf16,
        # which is exactly the rounding we want excluded here): block0
        # via the module, then fold the identity tail and run the chain
        # kernel in f32 interpret mode.
        p = params["params"]
        x0 = Bottleneck(f, stride=1, downsample=True,
                        dtype=jnp.float32).apply(
            {"params": p["block0"]}, x)
        blocks = [p[f"block{i}"] for i in (1, 2)]
        ws = bk.fold_bottleneck_params(blocks)
        out = bk.bottleneck_chain(x0, *ws, dtype=jnp.float32,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
