"""Property-based tests (hypothesis) for the L0/L1 math.

The oracle tests in test_boxes/test_nms pin fixed seeds; these sweep the
input space for the algebraic invariants the pipeline depends on:
encode/decode inversion, IoU bounds/symmetry/identity, clip idempotence,
and NMS greedy-prefix agreement with the O(N^2) oracle.

Shapes are FIXED per test (hypothesis draws values, not shapes) so each
property compiles its jitted function once.
"""

import numpy as np
import pytest

from hypothesis import assume, given, settings, strategies as st

import jax.numpy as jnp

from scda_tpu.core.boxes import (
    bbox_overlaps, bbox_transform, bbox_transform_inv, clip_boxes,
)
from scda_tpu.ops.nms import nms
from tests.test_nms import np_greedy_nms

settings.register_profile(
    "ci", max_examples=20, deadline=None, derandomize=True)
settings.load_profile("ci")

N = 24


def _boxes_strategy(n, size=500.0, min_wh=1.0):
    """(n, 4) float32 x1<x2, y1<y2 boxes inside [0, size]."""
    coord = st.floats(0.0, size - min_wh - 1, width=32)
    wh = st.floats(min_wh, 150.0, width=32)
    box = st.tuples(coord, coord, wh, wh).map(
        lambda t: (t[0], t[1],
                   min(t[0] + t[2], size), min(t[1] + t[3], size)))
    return st.lists(box, min_size=n, max_size=n).map(
        lambda bs: np.asarray(bs, np.float32))


class TestBoxAlgebra:
    @given(ex=_boxes_strategy(N, min_wh=8.0), gt=_boxes_strategy(N, min_wh=8.0))
    def test_encode_decode_inverts(self, ex, gt):
        deltas = bbox_transform(jnp.asarray(ex), jnp.asarray(gt))
        back = bbox_transform_inv(jnp.asarray(ex)[None], deltas[None])[0]
        # f32 exp/log round-trip noise is relative to box size (the
        # sub-pixel regime is covered by the seeded oracle tests).
        np.testing.assert_allclose(np.asarray(back), gt,
                                   rtol=1e-3, atol=0.25)

    @given(a=_boxes_strategy(N), b=_boxes_strategy(N))
    def test_iou_bounds_and_symmetry(self, a, b):
        ab = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
        ba = np.asarray(bbox_overlaps(jnp.asarray(b), jnp.asarray(a)))
        assert ab.shape == (N, N)
        assert (ab >= 0).all() and (ab <= 1.0 + 1e-6).all()
        np.testing.assert_allclose(ab, ba.T, rtol=1e-6, atol=1e-6)

    @given(a=_boxes_strategy(N))
    def test_iou_self_identity(self, a):
        d = np.diag(np.asarray(bbox_overlaps(jnp.asarray(a),
                                             jnp.asarray(a))))
        np.testing.assert_allclose(d, 1.0, rtol=1e-5)

    @given(a=_boxes_strategy(N, size=800.0))
    def test_clip_idempotent_and_bounded(self, a):
        h, w = 300.0, 400.0
        c1 = clip_boxes(jnp.asarray(a), h, w)
        c2 = clip_boxes(c1, h, w)
        c1, c2 = np.asarray(c1), np.asarray(c2)
        np.testing.assert_array_equal(c1, c2)
        assert (c1[:, 0::2] >= 0).all() and (c1[:, 0::2] <= w - 1).all()
        assert (c1[:, 1::2] >= 0).all() and (c1[:, 1::2] <= h - 1).all()


class TestRoiAlignProperty:
    """Algebraic invariants of the MXU-matmul RoI-Align (the default
    hot path): linearity in features and constant-map invariance —
    bilinear weights must form a partition of unity per output cell."""

    H, W, C, R = 16, 24, 8, 6

    def _rois(self, draw_vals):
        b = np.asarray(draw_vals, np.float32).reshape(self.R, 4)
        x1 = b[:, 0] * (self.W * 16 - 32)
        y1 = b[:, 1] * (self.H * 16 - 32)
        x2 = x1 + 16 + b[:, 2] * 120
        y2 = y1 + 16 + b[:, 3] * 120
        return np.stack([x1, y1,
                         np.minimum(x2, self.W * 16 - 1),
                         np.minimum(y2, self.H * 16 - 1)], -1)[None]

    @given(vals=st.lists(st.floats(0.0, 1.0, width=32),
                         min_size=24, max_size=24))
    def test_constant_map_pools_to_constant(self, vals):
        from scda_tpu.ops.roi_ops import roi_align_grouped

        feat = jnp.full((1, self.H, self.W, self.C), 3.5, jnp.float32)
        out = roi_align_grouped(feat, jnp.asarray(self._rois(vals)))
        np.testing.assert_allclose(np.asarray(out), 3.5,
                                   rtol=1e-5, atol=1e-5)

    @given(vals=st.lists(st.floats(0.0, 1.0, width=32),
                         min_size=24, max_size=24),
           seed=st.integers(0, 2**31 - 1))
    def test_linear_in_features(self, vals, seed):
        from scda_tpu.ops.roi_ops import roi_align_grouped

        r = np.random.RandomState(seed)
        fa = r.randn(1, self.H, self.W, self.C).astype(np.float32)
        fb = r.randn(1, self.H, self.W, self.C).astype(np.float32)
        rois = jnp.asarray(self._rois(vals))
        oa = np.asarray(roi_align_grouped(jnp.asarray(fa), rois))
        ob = np.asarray(roi_align_grouped(jnp.asarray(fb), rois))
        oab = np.asarray(roi_align_grouped(jnp.asarray(fa + 2.0 * fb),
                                           rois))
        np.testing.assert_allclose(oab, oa + 2.0 * ob,
                                   rtol=1e-4, atol=1e-4)


class TestNmsProperty:
    @given(boxes=_boxes_strategy(N, size=200.0, min_wh=5.0),
           scores=st.lists(
               st.floats(np.float32(1e-3), np.float32(1.0), width=32),
               min_size=N, max_size=N),
           thr=st.sampled_from([0.3, 0.5, 0.7]))
    def test_matches_greedy_oracle(self, boxes, scores, thr):
        scores = np.asarray(scores, np.float32)
        # Strict ordering: ties between identical scores are oracle-
        # ambiguous (device sort is not 'stable' in numpy's sense).
        scores += np.arange(N, 0, -1).astype(np.float32) * 1e-4
        # Greedy NMS is discontinuous at IoU == thr: the f64 oracle and
        # the f32 device kernel may legitimately disagree there, so skip
        # adversarial near-threshold draws (not a kernel defect).
        iw = (np.minimum(boxes[:, None, 2], boxes[None, :, 2])
              - np.maximum(boxes[:, None, 0], boxes[None, :, 0]) + 1)
        ih = (np.minimum(boxes[:, None, 3], boxes[None, :, 3])
              - np.maximum(boxes[:, None, 1], boxes[None, :, 1]) + 1)
        inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
        area = ((boxes[:, 2] - boxes[:, 0] + 1)
                * (boxes[:, 3] - boxes[:, 1] + 1))
        iou = inter / (area[:, None] + area[None, :] - inter)
        off = ~np.eye(N, dtype=bool)
        assume((np.abs(iou[off] - thr) > 1e-3).all())
        keep_idx, keep_mask = nms(
            jnp.asarray(boxes), jnp.asarray(scores),
            iou_threshold=thr, max_output=N)
        got = list(np.asarray(keep_idx)[np.asarray(keep_mask)])
        want = np_greedy_nms(boxes, scores, thr, N)
        assert got == want
