"""Fused Pallas VGG stem (ops/pallas/stem_kernel.py) vs the lax.conv
oracle, plus the backbone wiring (param-tree identity and numerical
equivalence of the fused branch).

The kernel replaces conv1_1+relu+conv1_2+relu+maxpool2x2 (ref
lib/model/faster_rcnn/vgg16.py:~40, torchvision features[0..4]) with one
VMEM-resident pass; semantics must match the composed ops exactly
(zero padding at borders included)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from scda_tpu.ops.pallas import stem_kernel
from scda_tpu.ops.pallas.stem_kernel import supported, vgg_stem_fused


def _oracle(x, k1, b1, k2, b2):
    def conv(x, k, b):
        y = lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.maximum(y + b, 0.0)

    y = conv(conv(x, k1, b1), k2, b2)
    return lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


def _weights(rng):
    return (
        jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(64).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05),
        jnp.asarray(rng.randn(64).astype(np.float32) * 0.1),
    )


class TestStemKernel:
    @pytest.mark.parametrize("shape", [(2, 32, 48), (1, 24, 16),
                                       (1, 48, 24)])  # incl. portrait
    def test_matches_conv_oracle_f32(self, rng, shape):
        b, h, w = shape
        x = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
        k1, b1, k2, b2 = _weights(rng)
        ref = _oracle(x, k1, b1, k2, b2)
        out = vgg_stem_fused(x, k1, b1, k2, b2, row_tile=8,
                             dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_border_zero_padding_semantics(self, rng):
        """An all-ones image: interior vs border values differ exactly as
        zero padding dictates — catches off-by-one halo or mask bugs."""
        x = jnp.ones((1, 16, 16, 3), jnp.float32)
        k1, b1, k2, b2 = _weights(rng)
        ref = _oracle(x, k1, b1, k2, b2)
        out = vgg_stem_fused(x, k1, b1, k2, b2, row_tile=8,
                             dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_close_to_f32_oracle(self, rng):
        x = jnp.asarray(rng.randn(1, 16, 24, 3).astype(np.float32))
        k1, b1, k2, b2 = _weights(rng)
        ref = np.asarray(_oracle(x, k1, b1, k2, b2))
        out = np.asarray(vgg_stem_fused(x, k1, b1, k2, b2, row_tile=8,
                                        interpret=True), np.float32)
        scale = np.abs(ref).max()
        assert np.abs(out - ref).max() / scale < 2e-2

    def test_sharded_batch_partitions_without_allgather(self, rng):
        """Under pjit with the batch sharded over the 8-device mesh the
        custom_partitioning rule must run the kernel on local shards —
        no all-gather of the full-res image (GSPMD's default for an
        unruled Mosaic custom call) — and match the unsharded result."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())

        x = jnp.asarray(rng.randn(8, 16, 16, 3).astype(np.float32))
        k1, b1, k2, b2 = _weights(rng)
        fn = functools.partial(vgg_stem_fused, row_tile=8,
                               dtype=jnp.float32, interpret=True)
        jf = jax.jit(fn, in_shardings=(data, repl, repl, repl, repl),
                     out_shardings=data)
        hlo = jf.lower(x, k1, b1, k2, b2).compile().as_text()
        assert "all-gather" not in hlo
        out = np.asarray(jf(x, k1, b1, k2, b2))
        ref = np.asarray(fn(x, k1, b1, k2, b2))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_supported_gate(self):
        assert supported(512, 1024, 3, 64, 8)
        assert supported(1024, 608, 3, 64, 8)      # portrait canvas
        assert not supported(510, 1024, 3, 64, 8)  # H % row_tile
        assert not supported(512, 1023, 3, 64, 8)  # W % 8
        assert not supported(512, 1024, 4, 64, 8)  # C_in
        # VMEM budget: aligned-but-huge canvases must FALL BACK, not
        # fail Mosaic compile (native-res Cityscapes; th=16 at 512x1024
        # is the measured compile-failure case).
        assert not supported(1024, 2048, 3, 64, 8)
        assert not supported(512, 1024, 3, 64, 16)

    def test_incompatible_freeze_config_rejected(self):
        """stem_pallas without frozen conv1/conv2 must fail loudly at
        step-build time (the fused stem produces no stem gradients)."""
        from scda_tpu.config import get_config, replace_path
        from scda_tpu.models.faster_rcnn import build_model
        from scda_tpu.train.steps import make_train_step

        cfg = get_config("vgg16")
        cfg = replace_path(cfg, "train.freeze_pretrained_layers", False)
        assert cfg.model.stem_pallas  # default on -> bad combo
        model = build_model(cfg.model)
        with pytest.raises(ValueError, match="stem_pallas"):
            make_train_step(model, cfg)
        ok = replace_path(cfg, "model.stem_pallas", False)
        make_train_step(build_model(ok.model), ok)  # builds fine


class TestMeshIntegration:
    @pytest.mark.slow
    def test_full_train_step_on_mesh_with_fused_stem(self, monkeypatch):
        """The partitioned stem inside the REAL pjit train step on the
        8-device mesh: batch sharded, params replicated, grads psummed —
        the custom_partitioning rule must compose with in_shardings,
        value_and_grad (stop_gradient subtree) and the optimizer."""
        import dataclasses

        from scda_tpu.config import Config, DataConfig, ModelConfig, \
            ProposalConfig, RPNTargetConfig, ROITargetConfig, TrainConfig
        from scda_tpu.models.faster_rcnn import build_model, init_params
        from scda_tpu.parallel.mesh import make_mesh, replicate, \
            shard_batch
        from scda_tpu.train.state import create_train_state
        from scda_tpu.train.steps import make_train_step

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(
            stem_kernel, "vgg_stem_fused",
            functools.partial(vgg_stem_fused, interpret=True))

        cfg = Config(
            model=ModelConfig(backbone="vgg16", num_classes=5,
                              compute_dtype="bfloat16"),
            train=TrainConfig(
                batch_size=8,
                proposal=ProposalConfig(pre_nms_top_n=64,
                                        post_nms_top_n=16,
                                        nms_thresh=0.7, min_size=2.0),
                rpn_target=RPNTargetConfig(batch_size=32),
                roi_target=ROITargetConfig(batch_size=16),
            ),
            data=DataConfig(image_size=(64, 96), max_gt_boxes=4),
        )
        model = build_model(cfg.model)
        params = init_params(model, jax.random.key(0), (1, 64, 96, 3))
        mesh = make_mesh()
        state = replicate(mesh, create_train_state(cfg, params))
        step = make_train_step(model, cfg, mesh=mesh, donate=False)

        r = np.random.RandomState(0)
        g = cfg.data.max_gt_boxes
        gt = np.zeros((8, g, 5), np.float32)
        gt[:, 0] = [8, 8, 40, 40, 1]
        gt[:, 1] = [30, 20, 80, 56, 3]
        batch = shard_batch(mesh, (
            r.randn(8, 64, 96, 3).astype(np.float32) * 30,
            np.tile(np.asarray([[64, 96, 1.0]], np.float32), (8, 1)),
            gt, np.full((8,), 2, np.int32),
        ))
        rng = replicate(mesh, jax.random.key(7))
        state, metrics = step(state, *batch, rng)
        assert np.isfinite(float(metrics["loss"]))
        assert int(jax.device_get(state.step)) == 1


class TestBackboneWiring:
    def test_param_tree_identical_and_outputs_match(self, rng,
                                                    monkeypatch):
        """The fused branch must declare the exact same parameter tree as
        the unfused stem (checkpoints/converters depend on it) and
        produce the same features.  The TPU gate is monkeypatched so the
        branch runs on CPU in interpret mode."""
        from scda_tpu.models.backbones.vgg import VGG16Backbone

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(
            stem_kernel, "vgg_stem_fused",
            functools.partial(vgg_stem_fused, interpret=True))

        x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))
        fused = VGG16Backbone(dtype=jnp.bfloat16, stem_pallas=True)
        plain = VGG16Backbone(dtype=jnp.bfloat16, stem_pallas=False)
        vf = fused.init(jax.random.key(0), x)
        vp = plain.init(jax.random.key(0), x)
        tf = jax.tree.map(lambda a: (a.shape, a.dtype), vf)
        tp = jax.tree.map(lambda a: (a.shape, a.dtype), vp)
        assert tf == tp

        # Same weights through both paths -> same features (bf16 noise).
        of = np.asarray(fused.apply(vp, x), np.float32)
        op = np.asarray(plain.apply(vp, x), np.float32)
        scale = np.abs(op).max() + 1e-6
        assert np.abs(of - op).max() / scale < 3e-2

    def test_gradients_blocked_only_through_frozen_stem(self, rng,
                                                        monkeypatch):
        """stop_gradient on the fused stem must not zero gradients of the
        TRAINABLE convs (conv5 onward)."""
        from scda_tpu.models.backbones.vgg import VGG16Backbone

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(
            stem_kernel, "vgg_stem_fused",
            functools.partial(vgg_stem_fused, interpret=True))

        x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
        net = VGG16Backbone(dtype=jnp.bfloat16, stem_pallas=True)
        v = net.init(jax.random.key(0), x)

        def loss(params):
            return jnp.sum(net.apply({"params": params}, x)
                           .astype(jnp.float32))

        g = jax.grad(loss)(v["params"])
        # conv1/conv2 (fused, frozen): zero grads by stop_gradient.
        assert float(jnp.abs(g["conv0"]["kernel"]).max()) == 0.0
        assert float(jnp.abs(g["conv2"]["kernel"]).max()) == 0.0
        # conv2_1 (torch idx 5) is OUTSIDE the kernel: grads flow.
        assert float(jnp.abs(g["conv5"]["kernel"]).max()) > 0.0
