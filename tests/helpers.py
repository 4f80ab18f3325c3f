"""Shared test helpers: tiny configs and synthetic batches."""

import dataclasses

import numpy as np

from scda_tpu.config import (
    AdaptConfig, AnchorConfig, Config, DataConfig, ModelConfig,
    ProposalConfig, ROITargetConfig, RPNTargetConfig, TestConfig,
    TrainConfig,
)


def tiny_config(num_classes: int = 5, backbone: str = "tiny",
                adapt: bool = False) -> Config:
    """Small static sizes so CPU tests compile/run fast.

    num_classes counts background (4 fg synthetic classes + bg = 5).
    """
    return Config(
        model=ModelConfig(
            backbone=backbone,
            num_classes=num_classes,
            compute_dtype="float32",
            rpn_channels=64,
        ),
        train=TrainConfig(
            batch_size=2,
            proposal=ProposalConfig(pre_nms_top_n=256, post_nms_top_n=64,
                                    nms_thresh=0.7, min_size=4.0),
            rpn_target=RPNTargetConfig(batch_size=64),
            roi_target=ROITargetConfig(batch_size=32),
        ),
        test=TestConfig(
            proposal=ProposalConfig(pre_nms_top_n=128, post_nms_top_n=32,
                                    nms_thresh=0.7, min_size=4.0),
            max_dets_per_class=8,
            max_per_image=16,
        ),
        data=DataConfig(
            scale=128,
            max_size=224,
            image_size=(128, 192),
            max_gt_boxes=8,
        ),
        adapt=AdaptConfig(
            enabled=adapt, num_groups=4, mining_top_n=32, kmeans_iters=4,
        ),
        # Default anchors (128-512 px) never fit inside the 128x192 test
        # canvas (no anchor is fully inside -> RPN gets zero targets);
        # scale them to the canvas.
        anchors=AnchorConfig(scales=(2.0, 4.0, 8.0)),
    )


def synthetic_batch(rng: np.random.RandomState, cfg: Config, batch_size=2):
    """Random batch with plausible gt boxes in canvas coords."""
    h, w = cfg.data.image_size
    g = cfg.data.max_gt_boxes
    image = rng.randn(batch_size, h, w, 3).astype(np.float32) * 30
    gt = np.zeros((batch_size, g, 5), np.float32)
    num = rng.randint(1, g // 2 + 1, size=batch_size).astype(np.int32)
    for b in range(batch_size):
        for i in range(num[b]):
            x1 = rng.uniform(0, w - 40)
            y1 = rng.uniform(0, h - 40)
            bw = rng.uniform(16, min(w - x1 - 1, 80))
            bh = rng.uniform(16, min(h - y1 - 1, 80))
            gt[b, i] = [x1, y1, x1 + bw, y1 + bh,
                        rng.randint(1, cfg.model.num_classes)]
    im_info = np.tile(np.array([[h, w, 1.0]], np.float32), (batch_size, 1))
    return image, im_info, gt, num
