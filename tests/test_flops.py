"""FLOP-walker pins: bench.py's MFU denominators must not drift.

Hand-derived reference values for VGG16 at the 512x1024 canvas:
conv stack 320.4 GFLOP (sum over VGG16_LAYOUT at the per-stage
resolutions), RPN 9.8, fc6@300 rois 61.7, fc7 10.1."""

import numpy as np

from scda_tpu.config import get_config, replace_path
from scda_tpu.utils import flops as F


class TestFlops:
    def test_vgg16_backbone_hand_value(self):
        # conv1_1 alone: 512*1024*3*64*9*2 = 1.812 GFLOP.
        frozen, trainable = F.vgg16_backbone_flops(512, 1024,
                                                   split_frozen=True)
        assert abs(frozen + trainable - 320.4e9) / 320.4e9 < 0.01
        # conv1_1+1_2+2_1+2_2 are the frozen group.
        expect_frozen = (1.812 + 38.65 + 19.33 + 38.65) * 1e9
        assert abs(frozen - expect_frozen) / expect_frozen < 0.01

    def test_inference_composition(self):
        cfg = get_config("vgg16")
        total = F.inference_flops_per_image(cfg, (512, 1024))
        # backbone + rpn + fc6/fc7@300 + cls/box heads
        parts = (F.vgg16_backbone_flops(512, 1024)
                 + F.rpn_flops(32, 64, 512, 512)
                 + F.vgg_head_flops(300)
                 + F.cls_head_flops(300, 4096, 9, False))
        assert total == parts
        assert 390e9 < total < 415e9

    def test_train_counts_frozen_forward_only(self):
        cfg = get_config("vgg16")
        t_frozen = F.train_flops_per_image(cfg, (512, 1024))
        cfg2 = replace_path(cfg, "train.freeze_pretrained_layers", False)
        t_all = F.train_flops_per_image(cfg2, (512, 1024))
        fr, _ = F.vgg16_backbone_flops(512, 1024, split_frozen=True)
        # Unfreezing adds exactly 2x the frozen group's forward FLOPs.
        np.testing.assert_allclose(t_all - t_frozen, 2 * fr, rtol=1e-9)

    def test_resnet_head_hand_value(self):
        """layer4 on 7x7 pooled rois: stride-2 convs output ceil(7/2)=4,
        not floor (the r3 review caught a 44% undercount here)."""
        b0 = (2 * 49 * 1024 * 512          # conv1 1x1 @7x7
              + 2 * 16 * 512 * 512 * 9     # conv2 3x3 s2 -> 4x4
              + 2 * 16 * 512 * 2048        # conv3 1x1 @4x4
              + 2 * 16 * 1024 * 2048)      # downsample 1x1 s2 -> 4x4
        b12 = 2 * (2 * 16 * 2048 * 512
                   + 2 * 16 * 512 * 512 * 9
                   + 2 * 16 * 512 * 2048)
        assert F.resnet_head_flops(101, 300) == (b0 + b12) * 300

    def test_resnet_backbone_magnitude(self):
        # ResNet-101 C4 base at 512x1024 is ~150 GFLOP (well-known
        # ~7.8 GFLOP at 224^2 x (512*1024)/(224*224) scaling for the
        # first 3 stages).
        total = F.resnet_backbone_flops(101, 512, 1024)
        assert 120e9 < total < 190e9
