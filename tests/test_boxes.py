"""Unit tests for scda_tpu.core.boxes against numpy/torch oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from scda_tpu.core import boxes as B


def np_iou(a, b):
    """O(N*M) numpy oracle mirroring ref lib/model/utils/bbox.pyx."""
    out = np.zeros((len(a), len(b)), np.float64)
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            iw = min(bi[2], bj[2]) - max(bi[0], bj[0]) + 1
            ih = min(bi[3], bj[3]) - max(bi[1], bj[1]) + 1
            if iw > 0 and ih > 0:
                inter = iw * ih
                ua = (
                    (bi[2] - bi[0] + 1) * (bi[3] - bi[1] + 1)
                    + (bj[2] - bj[0] + 1) * (bj[3] - bj[1] + 1)
                    - inter
                )
                out[i, j] = inter / ua
    return out


def random_boxes(rng, n, size=600):
    x1 = rng.uniform(0, size, n)
    y1 = rng.uniform(0, size, n)
    w = rng.uniform(1, size / 2, n)
    h = rng.uniform(1, size / 2, n)
    return np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)


class TestAnchors:
    def test_base_anchor_count_and_shape(self):
        a = B.generate_base_anchors(16, (0.5, 1, 2), (8, 16, 32))
        assert a.shape == (9, 4)

    def test_base_anchors_match_reference_values(self):
        # Canonical upstream generate_anchors() output (widely published
        # in the py-faster-rcnn docstring) for the default params.
        a = B.generate_base_anchors(16, (0.5, 1, 2), (8, 16, 32))
        expected = np.array(
            [
                [-84.0, -40.0, 99.0, 55.0],
                [-176.0, -88.0, 191.0, 103.0],
                [-360.0, -184.0, 375.0, 199.0],
                [-56.0, -56.0, 71.0, 71.0],
                [-120.0, -120.0, 135.0, 135.0],
                [-248.0, -248.0, 263.0, 263.0],
                [-36.0, -80.0, 51.0, 95.0],
                [-80.0, -168.0, 95.0, 183.0],
                [-168.0, -344.0, 183.0, 359.0],
            ]
        )
        np.testing.assert_allclose(a, expected, atol=1e-4)

    def test_shift_anchors(self):
        base = B.generate_base_anchors()
        shifted = B.shift_anchors(base, 3, 5, 16)
        assert shifted.shape == (3 * 5 * 9, 4)
        # first cell == base anchors
        np.testing.assert_allclose(shifted[:9], base)
        # cell (0, 1) shifted by stride in x
        np.testing.assert_allclose(
            shifted[9:18], base + np.array([16, 0, 16, 0], np.float32)
        )
        # cell (1, 0) shifted by stride in y (cell-major over rows)
        np.testing.assert_allclose(
            shifted[5 * 9 : 5 * 9 + 9], base + np.array([0, 16, 0, 16], np.float32)
        )


class TestTransforms:
    def test_encode_decode_roundtrip(self, rng):
        ex = random_boxes(rng, 64)
        gt = random_boxes(rng, 64)
        deltas = B.bbox_transform(jnp.array(ex), jnp.array(gt))
        rec = B.bbox_transform_inv(jnp.array(ex), deltas)
        np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-2)

    def test_decode_zero_deltas_identity(self, rng):
        ex = random_boxes(rng, 16)
        rec = B.bbox_transform_inv(jnp.array(ex), jnp.zeros((16, 4)))
        np.testing.assert_allclose(np.asarray(rec), ex, rtol=1e-5, atol=1e-3)

    def test_encode_matches_torch_oracle(self, rng):
        torch = pytest.importorskip("torch")
        ex = random_boxes(rng, 32)
        gt = random_boxes(rng, 32)

        def torch_encode(ex_rois, gt_rois):
            ex_w = ex_rois[:, 2] - ex_rois[:, 0] + 1.0
            ex_h = ex_rois[:, 3] - ex_rois[:, 1] + 1.0
            ex_cx = ex_rois[:, 0] + 0.5 * ex_w
            ex_cy = ex_rois[:, 1] + 0.5 * ex_h
            gt_w = gt_rois[:, 2] - gt_rois[:, 0] + 1.0
            gt_h = gt_rois[:, 3] - gt_rois[:, 1] + 1.0
            gt_cx = gt_rois[:, 0] + 0.5 * gt_w
            gt_cy = gt_rois[:, 1] + 0.5 * gt_h
            return torch.stack(
                [
                    (gt_cx - ex_cx) / ex_w,
                    (gt_cy - ex_cy) / ex_h,
                    torch.log(gt_w / ex_w),
                    torch.log(gt_h / ex_h),
                ],
                1,
            )

        want = torch_encode(torch.tensor(ex), torch.tensor(gt)).numpy()
        got = np.asarray(B.bbox_transform(jnp.array(ex), jnp.array(gt)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_clip(self):
        b = jnp.array([[-10.0, -5.0, 700.0, 800.0], [10, 10, 20, 20]])
        c = np.asarray(B.clip_boxes(b, 600, 500))
        np.testing.assert_allclose(c[0], [0, 0, 499, 599])
        np.testing.assert_allclose(c[1], [10, 10, 20, 20])


class TestIoU:
    def test_matches_numpy_oracle(self, rng):
        a = random_boxes(rng, 37)
        b = random_boxes(rng, 23)
        got = np.asarray(B.bbox_overlaps(jnp.array(a), jnp.array(b)))
        np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5, atol=1e-6)

    def test_batched(self, rng):
        a = np.stack([random_boxes(rng, 11) for _ in range(3)])
        b = np.stack([random_boxes(rng, 7) for _ in range(3)])
        got = np.asarray(B.bbox_overlaps_batch(jnp.array(a), jnp.array(b)))
        for i in range(3):
            np.testing.assert_allclose(got[i], np_iou(a[i], b[i]), rtol=1e-5,
                                       atol=1e-6)

    def test_identity(self, rng):
        a = random_boxes(rng, 9)
        got = np.asarray(B.bbox_overlaps(jnp.array(a), jnp.array(a)))
        np.testing.assert_allclose(np.diag(got), np.ones(9), rtol=1e-6)


class TestSmoothL1:
    def test_matches_torch_oracle(self, rng):
        torch = pytest.importorskip("torch")
        pred = rng.randn(8, 12).astype(np.float32)
        tgt = rng.randn(8, 12).astype(np.float32)
        iw = (rng.rand(8, 12) > 0.5).astype(np.float32)
        ow = np.full((8, 12), 1.0 / 96, np.float32)

        sigma2 = 9.0  # sigma = 3 (RPN setting)
        tp, tt = torch.tensor(pred), torch.tensor(tgt)
        diff = torch.tensor(iw) * (tp - tt)
        absd = diff.abs()
        flag = (absd < 1.0 / sigma2).float()
        ref = (
            torch.tensor(ow)
            * (flag * 0.5 * sigma2 * diff**2 + (1 - flag) * (absd - 0.5 / sigma2))
        ).sum()

        got = B.smooth_l1_loss(
            jnp.array(pred), jnp.array(tgt), jnp.array(iw), jnp.array(ow),
            sigma=3.0,
        )
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
