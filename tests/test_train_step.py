"""End-to-end smoke tests: supervised train step, SCDA step, inference,
and the 8-device simulated mesh (the fake-backend distributed test the
reference never had — SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import synthetic_batch, tiny_config
from scda_tpu.adapt.scda import (
    create_scda_state, init_discriminator, make_scda_train_step,
)
from scda_tpu.models.detector import forward_inference
from scda_tpu.models.faster_rcnn import build_model, init_params
from scda_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from scda_tpu.train.state import create_train_state
from scda_tpu.train.steps import make_eval_step, make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = build_model(cfg.model)
    h, w = cfg.data.image_size
    params = init_params(model, jax.random.key(0), (1, h, w, 3))
    return cfg, model, params


class TestTrainStep:
    def test_two_steps_loss_finite_and_decreasing_capable(self, setup, rng):
        cfg, model, params = setup
        state = create_train_state(cfg, params, steps_per_epoch=10)
        step_fn = make_train_step(model, cfg, donate=False)
        batch = synthetic_batch(rng, cfg)
        base_rng = jax.random.key(42)

        losses = []
        for _ in range(3):
            state, metrics = step_fn(state, *[jnp.array(x) for x in batch],
                                     base_rng)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses), losses
        assert int(state.step) == 3
        # Overfitting a single batch must reduce the loss.
        assert losses[-1] < losses[0], losses

    def test_bf16_momentum_buffers(self, setup, rng):
        """train.momentum_dtype=bfloat16 stores the sgd trace in bf16
        (halves optimizer-state HBM traffic) and still learns."""
        import dataclasses

        cfg0, model, params = setup
        cfg = dataclasses.replace(cfg0, train=dataclasses.replace(
            cfg0.train, momentum_dtype="bfloat16"))
        state = create_train_state(cfg, params)
        dts = {l.dtype for l in jax.tree_util.tree_leaves(state.opt_state)
               if hasattr(l, "dtype") and getattr(l, "ndim", 0) > 0}
        assert dts == {jnp.dtype(jnp.bfloat16)}, dts
        step_fn = make_train_step(model, cfg, donate=False)
        batch = [jnp.array(x) for x in synthetic_batch(rng, cfg)]
        losses = []
        for _ in range(3):
            state, m = step_fn(state, *batch, jax.random.key(0))
            losses.append(float(m["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0], losses

    def test_metrics_keys(self, setup, rng):
        cfg, model, params = setup
        state = create_train_state(cfg, params)
        step_fn = make_train_step(model, cfg, donate=False)
        batch = synthetic_batch(rng, cfg)
        _, metrics = step_fn(state, *[jnp.array(x) for x in batch],
                             jax.random.key(0))
        for k in ("loss", "rpn_cls", "rpn_box", "rcnn_cls", "rcnn_box",
                  "fg_cnt", "bg_cnt"):
            assert k in metrics
        assert float(metrics["fg_cnt"]) >= 1
        # A dead RPN (no anchor fully inside the canvas -> all labels -1)
        # yields exactly-zero rpn losses; guard against it.
        assert float(metrics["rpn_cls"]) > 0.0
        assert float(metrics["rpn_box"]) > 0.0

    def test_frozen_params_do_not_move(self, rng):
        # VGG16 conv1-2 must stay frozen under the optimizer mask.
        # Drives the REAL optimizer (create_train_state's masked tx +
        # apply_gradients) with a synthetic all-ones gradient tree
        # instead of compiling the full train step (was the suite's
        # slowest test at 83 s; step-level freezing is covered by
        # test_stem_kernel.py::test_gradients_blocked_only_through_
        # frozen_stem and the trajectory tests).
        cfg = tiny_config(backbone="vgg16")
        model = build_model(cfg.model)
        h, w = cfg.data.image_size
        params = init_params(model, jax.random.key(0), (1, h, w, 3))
        state = create_train_state(cfg, params)
        grads = jax.tree.map(jnp.ones_like, state.params)
        new_state = state.apply_gradients(grads=grads)
        before = np.asarray(params["backbone"]["conv0"]["kernel"])
        before_c5 = np.asarray(params["backbone"]["conv28"]["kernel"])
        after = np.asarray(new_state.params["backbone"]["conv0"]["kernel"])
        after_c5 = np.asarray(new_state.params["backbone"]["conv28"]["kernel"])
        np.testing.assert_array_equal(before, after)
        assert np.abs(after_c5 - before_c5).max() > 0  # unfrozen layer moved


class TestInference:
    def test_detections_shapes_and_validity(self, setup, rng):
        cfg, model, params = setup
        eval_fn = make_eval_step(model, cfg)
        image, im_info, _, _ = synthetic_batch(rng, cfg)
        dets = eval_fn(params, jnp.array(image), jnp.array(im_info))
        b = image.shape[0]
        d = cfg.test.max_per_image
        assert dets.boxes.shape == (b, d, 4)
        assert dets.scores.shape == (b, d)
        v = np.asarray(dets.valid)
        s = np.asarray(dets.scores)
        assert (s[v] > 0).all()
        c = np.asarray(dets.classes)
        assert ((c[v] >= 1) & (c[v] < cfg.model.num_classes)).all()
        bx = np.asarray(dets.boxes)[v]
        if len(bx):
            assert (bx[:, 2] >= bx[:, 0] - 1e-3).all()

    def test_bf16_serving_weights_near_identical(self, setup, rng):
        """test.bf16_weights: kernels cast to bf16 (weight-HBM-bound
        serving path); detections must match the f32 run closely."""
        from scda_tpu.evals.detect import bf16_inference_params

        cfg, model, params = setup
        p16 = bf16_inference_params(params)
        flat = jax.tree_util.tree_leaves_with_path(p16)
        for path, leaf in flat:
            if leaf.ndim >= 2:
                assert leaf.dtype == jnp.bfloat16, path
            else:
                assert leaf.dtype != jnp.bfloat16, path
        # The eval path must accept the mixed tree and produce sane
        # detections.  Numerical closeness to the f32 run is NOT
        # assertable on random-init weights (the untrained regression
        # head chaotically amplifies the cast); the trained-weight
        # drift is measured on-chip instead (~2e-4 score / 2e-3 px,
        # RESULTS.md).
        eval_fn = make_eval_step(model, cfg)
        image, im_info, _, _ = synthetic_batch(rng, cfg)
        d16 = eval_fn(p16, jnp.array(image), jnp.array(im_info))
        v = np.asarray(d16.valid)
        assert v.any()
        assert np.isfinite(np.asarray(d16.scores)[v]).all()
        assert np.isfinite(np.asarray(d16.boxes)[v]).all()


class TestScdaStep:
    def test_adaptation_step_runs_and_updates_both(self, setup, rng):
        cfg0, model, params = setup
        import dataclasses
        cfg = dataclasses.replace(
            cfg0, adapt=dataclasses.replace(cfg0.adapt, enabled=True)
        )
        d_model, d_params = init_discriminator(cfg, model,
                                               jax.random.key(3))
        det_state = create_train_state(cfg, params)
        state = create_scda_state(cfg, det_state, d_params)
        step_fn = make_scda_train_step(model, d_model, cfg, donate=False)

        src = synthetic_batch(rng, cfg)
        tgt_img, tgt_info, _, _ = synthetic_batch(rng, cfg)

        d_before = np.asarray(d_params["conv1"]["kernel"])
        state, metrics = step_fn(
            state, *[jnp.array(x) for x in src],
            jnp.array(tgt_img), jnp.array(tgt_info), jax.random.key(0),
        )
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["adv"]))
        d_after = np.asarray(state.d_params["conv1"]["kernel"])
        assert np.abs(d_after - d_before).max() > 0
        assert int(state.step) == 1

    def test_alternating_d_update_step(self, setup, rng):
        """adapt.d_update=alternating: GAN-style two-loss step runs and
        updates both parameter sets; metrics expose the D loss."""
        cfg0, model, params = setup
        import dataclasses
        cfg = dataclasses.replace(
            cfg0, adapt=dataclasses.replace(
                cfg0.adapt, enabled=True, d_update="alternating")
        )
        d_model, d_params = init_discriminator(cfg, model, jax.random.key(3))
        det_state = create_train_state(cfg, params)
        state = create_scda_state(cfg, det_state, d_params)
        step_fn = make_scda_train_step(model, d_model, cfg, donate=False)

        src = synthetic_batch(rng, cfg)
        tgt_img, tgt_info, _, _ = synthetic_batch(rng, cfg)
        d_before = np.asarray(d_params["conv1"]["kernel"])
        p_before = np.asarray(params["rpn"]["conv"]["kernel"])
        state, metrics = step_fn(
            state, *[jnp.array(x) for x in src],
            jnp.array(tgt_img), jnp.array(tgt_info), jax.random.key(0),
        )
        for k in ("loss", "adv", "d_loss", "d_acc"):
            assert np.isfinite(float(metrics[k])), k
        assert np.abs(
            np.asarray(state.d_params["conv1"]["kernel"]) - d_before
        ).max() > 0
        assert np.abs(
            np.asarray(state.det.params["rpn"]["conv"]["kernel"]) - p_before
        ).max() > 0

    @pytest.mark.slow  # five grad evaluations of the full SCDA forward
    def test_alternating_gradient_insulation(self, setup, rng):
        """The two losses must not leak into each other's parameters:
        D grads are invariant to adv_weight (the G loss sees a frozen D),
        and with adv_weight=0 the detector grads equal the pure detection
        grads (the D loss sees stop-gradient patches)."""
        import dataclasses

        from scda_tpu.adapt.scda import (
            scda_forward, scda_forward_alternating,
        )

        cfg0, model, params = setup
        base = dataclasses.replace(cfg0.adapt, enabled=True,
                                   d_update="alternating")
        d_model, d_params = init_discriminator(
            dataclasses.replace(cfg0, adapt=base), model, jax.random.key(3))
        src = tuple(jnp.array(x) for x in synthetic_batch(rng, cfg0))
        tgt_img, tgt_info, _, _ = synthetic_batch(rng, cfg0)
        tgt_img, tgt_info = jnp.array(tgt_img), jnp.array(tgt_info)
        key = jax.random.key(0)

        def grads(fwd, cfg, argnums):
            return jax.grad(
                lambda p, d: fwd(model, d_model, p, d, src, tgt_img,
                                 tgt_info, cfg, key)[0],
                argnums=argnums)(params, d_params)

        cfg_a = dataclasses.replace(cfg0, adapt=base)
        cfg_b = dataclasses.replace(
            cfg0, adapt=dataclasses.replace(base, adv_weight=100.0))
        g_d_a = grads(scda_forward_alternating, cfg_a, 1)
        g_d_b = grads(scda_forward_alternating, cfg_b, 1)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
            g_d_a, g_d_b)

        # adv_weight=0: detector grads == joint objective's det-only grads
        # (joint adv term vanishes; same rng => identical forward).
        cfg_0 = dataclasses.replace(
            cfg0, adapt=dataclasses.replace(base, adv_weight=0.0))
        g_alt = grads(scda_forward_alternating, cfg_0, 0)
        g_det = grads(scda_forward, cfg_0, 0)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
            g_alt, g_det)


class TestMesh8:
    def test_train_step_on_8_device_mesh(self, setup):
        cfg, model, params = setup
        assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
        mesh = make_mesh()
        state = create_train_state(cfg, params)
        state = replicate(mesh, state)
        step_fn = make_train_step(model, cfg, mesh=mesh, donate=False)

        r = np.random.RandomState(1)
        batch = synthetic_batch(r, cfg, batch_size=8)
        sharded = shard_batch(mesh, batch)
        rng = replicate(mesh, jax.random.key(0))
        state, metrics = step_fn(state, *sharded, rng)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1

    def test_scda_step_on_8_device_mesh(self, setup):
        """Full adaptation step (both optimizers) sharded over the
        simulated 8-device mesh — the driver's dryrun_multichip as a
        regression test."""
        import dataclasses

        cfg0, model, params = setup
        cfg = dataclasses.replace(
            cfg0, adapt=dataclasses.replace(cfg0.adapt, enabled=True)
        )
        mesh = make_mesh()
        d_model, d_params = init_discriminator(cfg, model,
                                               jax.random.key(5))
        det_state = create_train_state(cfg, params)
        state = replicate(mesh, create_scda_state(cfg, det_state, d_params))
        step_fn = make_scda_train_step(model, d_model, cfg, mesh=mesh,
                                       donate=False)

        r = np.random.RandomState(2)
        src = synthetic_batch(r, cfg, batch_size=8)
        tgt_img, tgt_info, _, _ = synthetic_batch(r, cfg, batch_size=8)
        sharded = shard_batch(mesh, (*src, tgt_img, tgt_info))
        rng = replicate(mesh, jax.random.key(0))
        state, metrics = step_fn(state, *sharded, rng)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["adv"]))

    def test_eval_step_on_8_device_mesh(self, setup):
        """Sharded inference: batch split over the mesh, fixed-size
        Detections gathered back data-sharded."""
        cfg, model, params = setup
        mesh = make_mesh()
        from scda_tpu.parallel.mesh import replicate as _repl
        params_r = _repl(mesh, params)
        eval_fn = make_eval_step(model, cfg, mesh=mesh)
        r = np.random.RandomState(3)
        image, im_info, _, _ = synthetic_batch(r, cfg, batch_size=8)
        sharded = shard_batch(mesh, (image, im_info))
        dets = eval_fn(params_r, *sharded)
        assert dets.boxes.shape == (8, cfg.test.max_per_image, 4)
        assert np.isfinite(np.asarray(dets.scores)).all()


class TestMultiscaleRoi:
    def test_level_assignment(self, rng):
        """Small rois must pool from the fine (stride-8) level."""
        import dataclasses

        from scda_tpu.models.faster_rcnn import pool_rois_multiscale
        from scda_tpu.config import ModelConfig

        cfg = ModelConfig(multiscale_roi=True, ms_fine_threshold=100.0,
                          pooling_size=3)
        # Distinguishable levels: fine all ones, coarse all twos.
        f8 = jnp.ones((1, 16, 24, 4))
        f16 = jnp.full((1, 8, 12, 4), 2.0)
        rois = jnp.asarray(
            [[[8.0, 8.0, 40.0, 40.0],        # sqrt(32*32)=32 < 100: fine
              [0.0, 0.0, 120.0, 120.0]]]      # 120 >= 100: coarse
        )
        out = np.asarray(pool_rois_multiscale(f8, f16, rois, cfg))
        assert np.allclose(out[0], 1.0), out[0].mean()
        assert np.allclose(out[1], 2.0), out[1].mean()

    def test_proj_after_pool_commute_matches(self, rng):
        """cfg.ms_proj_after_pool is an exact linear-algebra commute:
        align(proj(f)) == align(f) @ W + b*wsum — both formulations
        must agree, including rois whose samples fall outside the map
        (weight mass < 1 exercises the bias correction)."""
        import dataclasses

        from scda_tpu.models.faster_rcnn import (
            FasterRCNN, pool_rois_multiscale,
        )

        cfg0 = tiny_config()

        def mk(after):
            return dataclasses.replace(
                cfg0.model, multiscale_roi=True, ms_fine_threshold=100.0,
                ms_proj_after_pool=after)

        mc_a, mc_b = mk(False), mk(True)
        model_a = build_model(mc_a)
        model_b = build_model(mc_b)
        cfg = dataclasses.replace(cfg0, model=mc_a)
        h, w = cfg.data.image_size
        params = init_params(model_a, jax.random.key(0), (1, h, w, 3))

        image = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32) * 20)
        rois = jnp.asarray(
            [[[4.0, 4.0, 36.0, 36.0],                     # small -> fine
              [0.0, 0.0, w - 1.0, h - 1.0],               # big -> coarse
              [-20.0, -12.0, 24.0, 20.0],                 # border, fine
              [w - 30.0, h - 26.0, w + 40.0, h + 8.0]]],  # border, fine
            jnp.float32)

        f8a, f16a = model_a.apply({"params": params}, image,
                                  method=FasterRCNN.features_pyramid)
        a = pool_rois_multiscale(f8a, f16a, rois, mc_a)
        f8b, f16b = model_b.apply({"params": params}, image,
                                  method=FasterRCNN.features_pyramid)
        assert f8b.shape[-1] != f8a.shape[-1], "f8 must be un-projected"
        out_b = model_b.apply({"params": params}, f8b, f16b, rois,
                              method=FasterRCNN.pool_multiscale)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("proj_after", [False, True])
    def test_multiscale_train_step_runs(self, rng, proj_after):
        import dataclasses

        cfg0 = tiny_config()
        # ms_fine_threshold far above any roi size => EVERY roi takes the
        # fine-pool path, so c3_proj must receive gradient.
        cfg = dataclasses.replace(
            cfg0, model=dataclasses.replace(
                cfg0.model, multiscale_roi=True, ms_fine_threshold=1e6,
                ms_proj_after_pool=proj_after)
        )
        model = build_model(cfg.model)
        h, w = cfg.data.image_size
        params = init_params(model, jax.random.key(0), (1, h, w, 3))
        assert "c3_proj" in params
        state = create_train_state(cfg, params)
        step_fn = make_train_step(model, cfg, donate=False)
        batch = synthetic_batch(rng, cfg)
        state, metrics = step_fn(state, *[jnp.array(x) for x in batch],
                                 jax.random.key(0))
        assert np.isfinite(float(metrics["loss"]))
        # c3_proj is on the fine-pool path for every roi: it must move.
        assert np.abs(
            np.asarray(state.params["c3_proj"]["kernel"])
            - np.asarray(params["c3_proj"]["kernel"])
        ).max() > 0


class TestResumeDeterminism:
    def test_checkpoint_resume_reproduces_trajectory(self, setup, rng,
                                                     tmp_path):
        """The fault-tolerance contract (SURVEY §5): a run interrupted
        at step 2 and resumed from its checkpoint must land bit-equal
        with the uninterrupted run — per-step RNG folds from
        state.step, so no hidden Python-side RNG survives a restart."""
        from scda_tpu.train import checkpoint as ckpt

        cfg, model, params = setup
        step_fn = make_train_step(model, cfg, donate=False)
        base_rng = jax.random.key(42)
        batches = [
            [jnp.array(x) for x in synthetic_batch(rng, cfg)]
            for _ in range(4)
        ]

        # Uninterrupted 4-step run, saving at step 2.
        state = create_train_state(cfg, params, steps_per_epoch=10)
        for i, b in enumerate(batches):
            state, _ = step_fn(state, *b, base_rng)
            if i == 1:
                ckpt.save_checkpoint(str(tmp_path), state, 2)
        ckpt.wait_for_saves()

        # "Crashed" process: fresh template, restore, replay steps 3-4.
        template = create_train_state(
            cfg, init_params(model, jax.random.key(9),
                             (1,) + tuple(cfg.data.image_size) + (3,)),
            steps_per_epoch=10)
        resumed = ckpt.restore_checkpoint(str(tmp_path), template)
        assert int(resumed.step) == 2
        for b in batches[2:]:
            resumed, _ = step_fn(resumed, *b, base_rng)

        jax.tree_util.tree_map(
            np.testing.assert_array_equal,
            jax.device_get(state.params), jax.device_get(resumed.params),
        )
        jax.tree_util.tree_map(
            np.testing.assert_array_equal,
            jax.device_get(state.opt_state),
            jax.device_get(resumed.opt_state),
        )
