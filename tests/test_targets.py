"""Tests for anchor/proposal target assignment."""

import numpy as np
import jax
import jax.numpy as jnp

from scda_tpu.config import ROITargetConfig, RPNTargetConfig
from scda_tpu.core import boxes as B
from scda_tpu.models.targets import anchor_targets, proposal_targets


def make_anchor_inputs(rng, k_h=8, k_w=12, num_gt=3, g=8):
    base = B.generate_base_anchors(16, (0.5, 1, 2), (2, 4, 8))
    anchors = jnp.asarray(B.shift_anchors(base, k_h, k_w, 16))
    h, w = k_h * 16, k_w * 16
    gt = np.zeros((1, g, 5), np.float32)
    for i in range(num_gt):
        x1, y1 = rng.uniform(5, w - 80), rng.uniform(5, h - 80)
        gt[0, i] = [x1, y1, x1 + rng.uniform(30, 70),
                    y1 + rng.uniform(30, 70), rng.randint(1, 4)]
    im_info = np.array([[h, w, 1.0]], np.float32)
    return anchors, jnp.array(gt), jnp.array([num_gt], np.int32), jnp.array(im_info)


class TestAnchorTargets:
    def test_shapes_and_label_budget(self, rng):
        anchors, gt, num, info = make_anchor_inputs(rng)
        cfg = RPNTargetConfig(batch_size=64)
        out = anchor_targets(anchors, gt, num, info, cfg, jax.random.key(0))
        k = anchors.shape[0]
        assert out.labels.shape == (1, k)
        labels = np.asarray(out.labels[0])
        n_pos = (labels == 1).sum()
        n_neg = (labels == 0).sum()
        assert n_pos >= 1                      # every gt attracts an anchor
        assert n_pos <= 32                     # fg quota = 64 * 0.5
        assert n_pos + n_neg <= 64             # total budget
        assert n_neg > 0

    def test_every_gt_has_a_positive_before_subsample(self, rng):
        # With a huge budget nothing is subsampled away: each gt's best
        # anchor must be positive.
        anchors, gt, num, info = make_anchor_inputs(rng, num_gt=3)
        cfg = RPNTargetConfig(batch_size=100000)
        out = anchor_targets(anchors, gt, num, info, cfg, jax.random.key(0))
        labels = np.asarray(out.labels[0])
        pos_anchors = np.asarray(anchors)[labels == 1]
        gt_np = np.asarray(gt)[0, :3, :4]
        for gti in gt_np:
            ious = np.asarray(
                B.bbox_overlaps(jnp.array(pos_anchors), jnp.array(gti[None]))
            )
            assert ious.max() > 0.1

    def test_outside_anchors_ignored(self, rng):
        anchors, gt, num, info = make_anchor_inputs(rng)
        cfg = RPNTargetConfig()
        out = anchor_targets(anchors, gt, num, info, cfg, jax.random.key(1))
        a = np.asarray(anchors)
        labels = np.asarray(out.labels[0])
        outside = (
            (a[:, 0] < 0) | (a[:, 1] < 0)
            | (a[:, 2] >= float(info[0, 1])) | (a[:, 3] >= float(info[0, 0]))
        )
        assert (labels[outside] == -1).all()

    def test_positive_targets_decode_to_gt(self, rng):
        anchors, gt, num, info = make_anchor_inputs(rng, num_gt=2)
        cfg = RPNTargetConfig(batch_size=100000)
        out = anchor_targets(anchors, gt, num, info, cfg, jax.random.key(0))
        labels = np.asarray(out.labels[0])
        pos = labels == 1
        decoded = np.asarray(
            B.bbox_transform_inv(anchors, out.bbox_targets[0])
        )[pos]
        gt_np = np.asarray(gt)[0, :2, :4]
        for d in decoded:
            best = np.asarray(
                B.bbox_overlaps(jnp.array(d[None]), jnp.array(gt_np))
            ).max()
            assert best > 0.95, d

    def test_deterministic_given_key(self, rng):
        anchors, gt, num, info = make_anchor_inputs(rng)
        cfg = RPNTargetConfig()
        a = anchor_targets(anchors, gt, num, info, cfg, jax.random.key(7))
        b = anchor_targets(anchors, gt, num, info, cfg, jax.random.key(7))
        np.testing.assert_array_equal(np.asarray(a.labels),
                                      np.asarray(b.labels))


class TestProposalTargets:
    def _inputs(self, rng, n=48, g=8, num_gt=3):
        props = []
        gt = np.zeros((1, g, 5), np.float32)
        for i in range(num_gt):
            x1, y1 = rng.uniform(5, 80), rng.uniform(5, 60)
            gt[0, i] = [x1, y1, x1 + rng.uniform(30, 60),
                        y1 + rng.uniform(30, 60), rng.randint(1, 4)]
        for _ in range(n):
            if rng.rand() < 0.4:  # near-gt proposal
                j = rng.randint(num_gt)
                jitter = rng.randn(4) * 4
                props.append(gt[0, j, :4] + jitter)
            else:
                x1, y1 = rng.uniform(0, 120), rng.uniform(0, 80)
                props.append([x1, y1, x1 + rng.uniform(10, 60),
                              y1 + rng.uniform(10, 60)])
        props = np.asarray(props, np.float32)[None]
        valid = np.ones((1, n), bool)
        return (jnp.array(props), jnp.array(valid), jnp.array(gt),
                jnp.array([num_gt], np.int32))

    def test_quota_and_labels(self, rng):
        props, valid, gt, num = self._inputs(rng)
        cfg = ROITargetConfig(batch_size=32, fg_fraction=0.25)
        out = proposal_targets(props, valid, gt, num, cfg, jax.random.key(0))
        assert out.rois.shape == (1, 32, 4)
        labels = np.asarray(out.labels[0])
        fg = np.asarray(out.fg_mask[0])
        assert fg.sum() <= 8           # 32 * 0.25
        assert (labels[fg] > 0).all()  # fg slots carry gt class
        assert (labels[~fg] == 0).all()

    def test_fg_rois_overlap_gt(self, rng):
        props, valid, gt, num = self._inputs(rng)
        cfg = ROITargetConfig(batch_size=32)
        out = proposal_targets(props, valid, gt, num, cfg, jax.random.key(0))
        fg = np.asarray(out.fg_mask[0])
        rois = np.asarray(out.rois[0])[fg]
        gt_np = np.asarray(gt)[0, :3, :4]
        if len(rois):
            ious = np.asarray(B.bbox_overlaps(jnp.array(rois),
                                              jnp.array(gt_np)))
            assert (ious.max(1) >= 0.5 - 1e-5).all()

    def test_gt_appended_guarantees_fg(self, rng):
        # Proposals far from any gt: the appended gt boxes themselves must
        # provide foreground samples (the reference's behaviour).
        n = 16
        props = np.tile(np.array([[200.0, 200.0, 230.0, 230.0]], np.float32),
                        (n, 1))[None]
        gt = np.zeros((1, 4, 5), np.float32)
        gt[0, 0] = [10, 10, 60, 60, 2]
        out = proposal_targets(
            jnp.array(props), jnp.ones((1, n), bool), jnp.array(gt),
            jnp.array([1], np.int32), ROITargetConfig(batch_size=16),
            jax.random.key(0),
        )
        assert np.asarray(out.fg_mask).sum() >= 1

    def test_bbox_targets_decode_back_to_gt(self, rng):
        props, valid, gt, num = self._inputs(rng)
        cfg = ROITargetConfig(batch_size=32)
        out = proposal_targets(props, valid, gt, num, cfg, jax.random.key(0))
        fg = np.asarray(out.fg_mask[0])
        stds = np.asarray(cfg.bbox_normalize_stds)
        means = np.asarray(cfg.bbox_normalize_means)
        raw = np.asarray(out.bbox_targets[0]) * stds + means
        decoded = np.asarray(
            B.bbox_transform_inv(out.rois[0], jnp.array(raw))
        )[fg]
        gt_np = np.asarray(gt)[0, :3, :4]
        for d in decoded:
            best = np.asarray(B.bbox_overlaps(jnp.array(d[None]),
                                              jnp.array(gt_np))).max()
            assert best > 0.95
