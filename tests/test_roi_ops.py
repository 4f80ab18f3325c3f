"""RoI align / pool tests vs straightforward numpy oracles.

The oracles implement the op specs independently (scalar loops, no
vectorization tricks) so agreement is meaningful.
"""

import numpy as np
import jax
import jax.numpy as jnp

from scda_tpu.ops.roi_ops import roi_align, roi_pool


def np_bilinear(feat, y, x):
    """feat (H, W, C); torchvision border rules."""
    H, W, _ = feat.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(feat.shape[-1], feat.dtype)
    y = min(max(y, 0.0), H - 1)
    x = min(max(x, 0.0), W - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    return (
        (1 - ly) * (1 - lx) * feat[y0, x0]
        + (1 - ly) * lx * feat[y0, x1]
        + ly * (1 - lx) * feat[y1, x0]
        + ly * lx * feat[y1, x1]
    )


def np_roi_align(feat, box, P, scale, s, aligned=False):
    off = 0.5 if aligned else 0.0
    x1, y1, x2, y2 = [v * scale - off for v in box]
    rw, rh = x2 - x1, y2 - y1
    if not aligned:
        rw, rh = max(rw, 1.0), max(rh, 1.0)
    bw, bh = rw / P, rh / P
    out = np.zeros((P, P, feat.shape[-1]), np.float64)
    for ph in range(P):
        for pw in range(P):
            acc = np.zeros(feat.shape[-1], np.float64)
            for iy in range(s):
                for ix in range(s):
                    y = y1 + (ph + (iy + 0.5) / s) * bh
                    x = x1 + (pw + (ix + 0.5) / s) * bw
                    acc += np_bilinear(feat, y, x)
            out[ph, pw] = acc / (s * s)
    return out


def np_roi_pool(feat, box, P, scale):
    H, W, C = feat.shape
    x1 = round(box[0] * scale)
    y1 = round(box[1] * scale)
    x2 = round(box[2] * scale)
    y2 = round(box[3] * scale)
    rw = max(x2 - x1 + 1, 1)
    rh = max(y2 - y1 + 1, 1)
    out = np.zeros((P, P, C), np.float64)
    for ph in range(P):
        for pw in range(P):
            hs = int(np.clip(np.floor(ph * rh / P) + y1, 0, H))
            he = int(np.clip(np.ceil((ph + 1) * rh / P) + y1, 0, H))
            ws = int(np.clip(np.floor(pw * rw / P) + x1, 0, W))
            we = int(np.clip(np.ceil((pw + 1) * rw / P) + x1, 0, W))
            if he > hs and we > ws:
                out[ph, pw] = feat[hs:he, ws:we].reshape(-1, C).max(0)
    return out


def random_rois(rng, n, im_h, im_w):
    x1 = rng.uniform(0, im_w - 20, n)
    y1 = rng.uniform(0, im_h - 20, n)
    x2 = x1 + rng.uniform(8, im_w / 2, n)
    y2 = y1 + rng.uniform(8, im_h / 2, n)
    return np.stack(
        [x1, y1, np.minimum(x2, im_w - 1), np.minimum(y2, im_h - 1)], 1
    ).astype(np.float32)


class TestRoiAlign:
    def test_matches_oracle(self, rng):
        feat = rng.randn(2, 16, 24, 8).astype(np.float32)
        rois = random_rois(rng, 12, 256, 384)
        bidx = rng.randint(0, 2, 12).astype(np.int32)
        got = np.asarray(
            roi_align(
                jnp.array(feat), jnp.array(rois), jnp.array(bidx),
                output_size=7, spatial_scale=1 / 16, sampling_ratio=2,
            )
        )
        for i in range(12):
            want = np_roi_align(feat[bidx[i]], rois[i], 7, 1 / 16, 2)
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)

    def test_aligned_variant(self, rng):
        feat = rng.randn(1, 16, 16, 4).astype(np.float32)
        rois = random_rois(rng, 6, 256, 256)
        got = np.asarray(
            roi_align(
                jnp.array(feat), jnp.array(rois),
                output_size=5, spatial_scale=1 / 16, sampling_ratio=3,
                aligned=True,
            )
        )
        for i in range(6):
            want = np_roi_align(feat[0], rois[i], 5, 1 / 16, 3, aligned=True)
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)

    def test_rois5_layout(self, rng):
        feat = rng.randn(2, 8, 8, 4).astype(np.float32)
        rois = random_rois(rng, 4, 128, 128)
        bidx = np.array([0, 1, 0, 1], np.int32)
        r5 = np.concatenate([bidx[:, None].astype(np.float32), rois], 1)
        a = roi_align(jnp.array(feat), jnp.array(rois), jnp.array(bidx))
        b = roi_align(jnp.array(feat), jnp.array(r5))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_gradients_flow_to_features(self, rng):
        feat = rng.randn(1, 8, 8, 4).astype(np.float32)
        rois = random_rois(rng, 3, 128, 128)

        def loss(f):
            return jnp.sum(roi_align(f, jnp.array(rois)) ** 2)

        g = jax.grad(loss)(jnp.array(feat))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_jit_static(self, rng):
        feat = rng.randn(1, 8, 8, 4).astype(np.float32)
        rois = random_rois(rng, 3, 128, 128)
        fn = jax.jit(lambda f, r: roi_align(f, r))
        out = fn(jnp.array(feat), jnp.array(rois))
        assert out.shape == (3, 7, 7, 4)


class TestRoiPool:
    def test_matches_oracle(self, rng):
        feat = rng.randn(2, 16, 24, 6).astype(np.float32)
        rois = random_rois(rng, 10, 256, 384)
        bidx = rng.randint(0, 2, 10).astype(np.int32)
        got = np.asarray(
            roi_pool(
                jnp.array(feat), jnp.array(rois), jnp.array(bidx),
                output_size=7, spatial_scale=1 / 16,
            )
        )
        for i in range(10):
            want = np_roi_pool(feat[bidx[i]], rois[i], 7, 1 / 16)
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)

    def test_tiny_roi(self, rng):
        # RoI smaller than one cell: every bin sees the same single cell.
        feat = rng.randn(1, 16, 16, 3).astype(np.float32)
        rois = np.array([[33.0, 49.0, 34.0, 50.0]], np.float32)
        got = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois)))
        want = np_roi_pool(feat[0], rois[0], 7, 1 / 16)
        np.testing.assert_allclose(got[0], want, rtol=1e-5)

    def test_full_image_roi(self, rng):
        feat = rng.randn(1, 32, 32, 3).astype(np.float32)
        rois = np.array([[0.0, 0.0, 511.0, 511.0]], np.float32)
        got = np.asarray(roi_pool(jnp.array(feat), jnp.array(rois)))
        want = np_roi_pool(feat[0], rois[0], 7, 1 / 16)
        np.testing.assert_allclose(got[0], want, rtol=1e-5)


class TestRoiAlignGrouped:
    """The MXU (matmul) formulation must match the gather formulation
    bit-for-bit up to float summation order."""

    def test_matches_gather_impl(self, rng):
        from scda_tpu.ops.roi_ops import roi_align, roi_align_grouped

        b, h, w, c, r, p = 2, 16, 24, 8, 12, 7
        feat = rng.randn(b, h, w, c).astype(np.float32)
        rois = np.stack(
            [random_rois(rng, r, h * 16, w * 16) for _ in range(b)]
        )  # (B, R, 4) in image coords
        grouped = roi_align_grouped(
            jnp.asarray(feat), jnp.asarray(rois),
            output_size=p, spatial_scale=1 / 16.0, sampling_ratio=2,
        )
        flat = roi_align(
            jnp.asarray(feat), jnp.asarray(rois.reshape(b * r, 4)),
            jnp.repeat(jnp.arange(b, dtype=jnp.int32), r),
            output_size=p, spatial_scale=1 / 16.0, sampling_ratio=2,
        )
        np.testing.assert_allclose(
            np.asarray(grouped).reshape(b * r, p, p, c),
            np.asarray(flat), rtol=1e-5, atol=1e-5,
        )

    def test_aligned_and_oob(self, rng):
        from scda_tpu.ops.roi_ops import roi_align, roi_align_grouped

        b, h, w, c, p = 1, 10, 12, 4, 5
        feat = rng.randn(b, h, w, c).astype(np.float32)
        # Boxes partially outside the feature map to hit border rules.
        rois = np.array(
            [[[-40.0, -30.0, 80.0, 60.0],
              [100.0, 90.0, 400.0, 300.0],
              [0.0, 0.0, 12 * 16.0, 10 * 16.0]]], np.float32,
        )
        for aligned in (False, True):
            g = roi_align_grouped(
                jnp.asarray(feat), jnp.asarray(rois), output_size=p,
                spatial_scale=1 / 16.0, sampling_ratio=2, aligned=aligned,
            )
            f = roi_align(
                jnp.asarray(feat), jnp.asarray(rois[0]),
                jnp.zeros((3,), jnp.int32), output_size=p,
                spatial_scale=1 / 16.0, sampling_ratio=2, aligned=aligned,
            )
            np.testing.assert_allclose(
                np.asarray(g)[0], np.asarray(f), rtol=1e-5, atol=1e-5,
            )

    def test_gradients_flow(self, rng):
        from scda_tpu.ops.roi_ops import roi_align_grouped

        feat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
        rois = jnp.asarray([[[8.0, 8.0, 100.0, 100.0]]])

        def loss(f):
            return jnp.sum(roi_align_grouped(f, rois, output_size=3,
                                             spatial_scale=1 / 16.0) ** 2)

        g = jax.grad(loss)(feat)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


def np_roi_align_adaptive(feat, box, P, scale):
    """torchvision adaptive sampling_ratio oracle: s = ceil(roi/P)."""
    x1, y1, x2, y2 = [v * scale for v in box]
    rw, rh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
    bw, bh = rw / P, rh / P
    sh = max(int(np.ceil(rh / P)), 1)
    sw = max(int(np.ceil(rw / P)), 1)
    out = np.zeros((P, P, feat.shape[-1]), np.float64)
    for ph in range(P):
        for pw in range(P):
            acc = np.zeros(feat.shape[-1], np.float64)
            for iy in range(sh):
                for ix in range(sw):
                    y = y1 + (ph + (iy + 0.5) / sh) * bh
                    x = x1 + (pw + (ix + 0.5) / sw) * bw
                    acc += np_bilinear(feat, y, x)
            out[ph, pw] = acc / (sh * sw)
    return out


def np_roi_align_legacy(feat, box, P, scale):
    """Element-wise transcription of the reference CUDA kernel
    (roi_align_kernel.cu:~20-270, crop-and-resize lineage)."""
    H, W, C = feat.shape
    x1, y1, x2, y2 = [v * scale for v in box]
    rw = max(x2 - x1 + 1.0, 0.0)
    rh = max(y2 - y1 + 1.0, 0.0)
    bh = rh / max(P - 1, 1)
    bw = rw / max(P - 1, 1)
    out = np.zeros((P, P, C), np.float64)
    for ph in range(P):
        for pw in range(P):
            h = ph * bh + y1
            w = pw * bw + x1
            if h < 0 or h >= H or w < 0 or w >= W:
                continue
            hs = min(int(np.floor(h)), H - 2)
            ws = min(int(np.floor(w)), W - 2)
            hr, wr = h - hs, w - ws
            out[ph, pw] = (
                (1 - hr) * (1 - wr) * feat[hs, ws]
                + (1 - hr) * wr * feat[hs, ws + 1]
                + hr * (1 - wr) * feat[hs + 1, ws]
                + hr * wr * feat[hs + 1, ws + 1]
            )
    return out


class TestRoiAlignAdaptive:
    def test_matches_adaptive_oracle(self, rng):
        feat = rng.randn(2, 16, 24, 6).astype(np.float32)
        rois = random_rois(rng, 10, 256, 384)
        bidx = rng.randint(0, 2, 10).astype(np.int32)
        got = np.asarray(
            roi_align(
                jnp.array(feat), jnp.array(rois), jnp.array(bidx),
                output_size=7, spatial_scale=1 / 16, sampling_ratio=0,
            )
        )
        for i in range(10):
            want = np_roi_align_adaptive(feat[bidx[i]], rois[i], 7, 1 / 16)
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)

    def test_grouped_matches_gather(self, rng):
        from scda_tpu.ops.roi_ops import roi_align_grouped

        b, h, w, c, r, p = 2, 16, 24, 8, 9, 7
        feat = rng.randn(b, h, w, c).astype(np.float32)
        rois = np.stack(
            [random_rois(rng, r, h * 16, w * 16) for _ in range(b)]
        )
        grouped = roi_align_grouped(
            jnp.asarray(feat), jnp.asarray(rois),
            output_size=p, spatial_scale=1 / 16.0, sampling_ratio=0,
        )
        flat = roi_align(
            jnp.asarray(feat), jnp.asarray(rois.reshape(b * r, 4)),
            jnp.repeat(jnp.arange(b, dtype=jnp.int32), r),
            output_size=p, spatial_scale=1 / 16.0, sampling_ratio=0,
        )
        np.testing.assert_allclose(
            np.asarray(grouped).reshape(b * r, p, p, c),
            np.asarray(flat), rtol=1e-4, atol=1e-4,
        )


class TestRoiAlignLegacy:
    """Reference-lineage (crop-and-resize style) RoIAlign — the mode to
    use with converted reference checkpoints (VERDICT r1 missing #2)."""

    def test_matches_cuda_kernel_oracle(self, rng):
        from scda_tpu.ops.roi_ops import roi_align_legacy

        feat = rng.randn(2, 16, 24, 6).astype(np.float32)
        rois = random_rois(rng, 12, 256, 384)
        bidx = rng.randint(0, 2, 12).astype(np.int32)
        got = np.asarray(
            roi_align_legacy(
                jnp.array(feat), jnp.array(rois), jnp.array(bidx),
                output_size=7, spatial_scale=1 / 16,
            )
        )
        for i in range(12):
            want = np_roi_align_legacy(feat[bidx[i]], rois[i], 7, 1 / 16)
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)

    def test_oob_and_extrapolation_rows(self, rng):
        """Boxes beyond the map exercise the write-zero rule; boxes
        ending in the last half-cell exercise the ratio>1 extrapolation."""
        from scda_tpu.ops.roi_ops import roi_align_legacy

        h, w = 10, 12
        feat = rng.randn(1, h, w, 3).astype(np.float32)
        rois = np.array([
            [-80.0, -60.0, 90.0, 70.0],          # partially oob
            [100.0, 80.0, (w - 0.3) * 16, (h - 0.3) * 16],  # last half-cell
            [300.0, 200.0, 900.0, 700.0],        # mostly oob right/bottom
        ], np.float32)
        got = np.asarray(
            roi_align_legacy(jnp.array(feat), jnp.array(rois),
                             jnp.zeros((3,), jnp.int32),
                             output_size=7, spatial_scale=1 / 16)
        )
        for i in range(3):
            want = np_roi_align_legacy(feat[0], rois[i], 7, 1 / 16)
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)

    def test_grouped_matches_flat(self, rng):
        from scda_tpu.ops.roi_ops import (
            roi_align_legacy, roi_align_legacy_grouped,
        )

        b, h, w, c, r, p = 2, 12, 16, 8, 8, 7
        feat = rng.randn(b, h, w, c).astype(np.float32)
        rois = np.stack(
            [random_rois(rng, r, h * 16, w * 16) for _ in range(b)]
        )
        grouped = roi_align_legacy_grouped(
            jnp.asarray(feat), jnp.asarray(rois),
            output_size=p, spatial_scale=1 / 16.0,
        )
        flat = roi_align_legacy(
            jnp.asarray(feat), jnp.asarray(rois.reshape(b * r, 4)),
            jnp.repeat(jnp.arange(b, dtype=jnp.int32), r),
            output_size=p, spatial_scale=1 / 16.0,
        )
        np.testing.assert_allclose(
            np.asarray(grouped).reshape(b * r, p, p, c),
            np.asarray(flat), rtol=1e-5, atol=1e-5,
        )

    def test_pool_rois_dispatch_and_gradients(self, rng):
        import dataclasses

        from scda_tpu.config import ModelConfig
        from scda_tpu.models.faster_rcnn import pool_rois

        feat = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
        rois = jnp.asarray(rng.rand(2, 3, 4).astype(np.float32) * 60)
        rois = rois.at[..., 2:].add(rois[..., :2] + 16)
        cfg = ModelConfig(pooling_mode="align_legacy", pooling_size=5)
        out = pool_rois(feat, rois, None, cfg)
        assert out.shape == (6, 5, 5, 4)

        def loss(f):
            return jnp.sum(pool_rois(f, rois, None, cfg) ** 2)

        g = jax.grad(loss)(feat)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestPallasRoiAlign:
    """The fused Pallas contraction kernel (interpret mode on CPU; the
    compiled kernel is A/B'd on real TPU — RESULTS.md)."""

    def test_matches_einsum_all_semantics(self, rng):
        from scda_tpu.ops.pallas.roi_align_kernel import (
            roi_align_grouped_pallas,
        )
        from scda_tpu.ops.roi_ops import (
            roi_align_grouped, roi_align_legacy_grouped,
        )

        b, h, w, c, r, p = 2, 12, 16, 8, 13, 7
        feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        rois = jnp.asarray(np.stack(
            [random_rois(rng, r, h * 16, w * 16) for _ in range(b)]
        ))
        cases = [
            (dict(sampling_ratio=2), roi_align_grouped, {}),
            (dict(sampling_ratio=0), roi_align_grouped, {}),
            (dict(sampling_ratio=2, aligned=True), roi_align_grouped, {}),
            (dict(legacy=True), roi_align_legacy_grouped,
             {"drop": ("legacy",)}),
        ]
        for kw, ref_fn, extra in cases:
            ref_kw = {k: v for k, v in kw.items()
                      if k not in extra.get("drop", ())}
            a = np.asarray(ref_fn(feat, rois, output_size=p, **ref_kw))
            # r_tile=4 does not divide R=13: exercises padding too.
            out = roi_align_grouped_pallas(
                feat, rois, output_size=p, r_tile=4, interpret=True, **kw)
            np.testing.assert_allclose(np.asarray(out), a,
                                       rtol=1e-5, atol=1e-5)

    def test_gradient_matches_einsum(self, rng):
        from scda_tpu.ops.pallas.roi_align_kernel import (
            roi_align_grouped_pallas,
        )
        from scda_tpu.ops.roi_ops import roi_align_grouped

        b, h, w, c, r = 1, 8, 10, 4, 5
        feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        rois = jnp.asarray(
            np.stack([random_rois(rng, r, h * 16, w * 16)]))

        def loss_pallas(f):
            out = roi_align_grouped_pallas(f, rois, output_size=5,
                                           interpret=True)
            return jnp.sum(out ** 2)

        def loss_einsum(f):
            return jnp.sum(
                roi_align_grouped(f, rois, output_size=5) ** 2)

        g_p = np.asarray(jax.grad(loss_pallas)(feat))
        g_e = np.asarray(jax.grad(loss_einsum)(feat))
        assert np.abs(g_p).max() > 0
        np.testing.assert_allclose(g_p, g_e, rtol=1e-4, atol=1e-5)

    def test_pool_rois_pallas_dispatch(self, rng):
        from jax.experimental.pallas import tpu as pltpu

        from scda_tpu.config import ModelConfig
        from scda_tpu.models.faster_rcnn import pool_rois

        feat = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
        rois = jnp.asarray(rng.rand(2, 3, 4).astype(np.float32) * 60)
        rois = rois.at[..., 2:].add(rois[..., :2] + 16)
        for mode in ("align", "align_legacy"):
            cfg = ModelConfig(pooling_mode=mode, pooling_size=5)
            want = np.asarray(pool_rois(feat, rois, None, cfg))
            cfg_p = ModelConfig(pooling_mode=mode, pooling_size=5,
                                roi_pallas=True)
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(pool_rois(feat, rois, None, cfg_p))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def np_roi_crop(feat, box, P, scale):
    """Oracle for roi_crop: corner-inclusive (2P x 2P) bilinear grid over
    the roi, zero-padded OOB, then 2x2 max-pool."""
    h, w, c = feat.shape
    g = 2 * P
    x1, y1, x2, y2 = [v * scale for v in box]
    t = np.linspace(0.0, 1.0, g)
    ys = y1 + t * (y2 - y1)
    xs = x1 + t * (x2 - x1)
    out = np.zeros((g, g, c), np.float32)
    for i, y in enumerate(ys):
        for j, x in enumerate(xs):
            out[i, j] = np_bilinear(feat, y, x)
    return out.reshape(P, 2, P, 2, c).max(axis=(1, 3))


class TestRoiCrop:
    def test_matches_oracle(self, rng):
        from scda_tpu.ops.roi_ops import roi_crop

        h, w, c, P = 12, 16, 6, 7
        feat = rng.randn(1, h, w, c).astype(np.float32)
        rois = random_rois(rng, 5, h * 16, w * 16)
        out = roi_crop(jnp.asarray(feat), jnp.asarray(rois),
                       jnp.zeros((5,), jnp.int32), output_size=P,
                       spatial_scale=1 / 16.0)
        for i in range(5):
            ref = np_roi_crop(feat[0], rois[i], P, 1 / 16.0)
            np.testing.assert_allclose(np.asarray(out)[i], ref,
                                       rtol=1e-4, atol=1e-4)

    def test_pool_rois_crop_mode(self, rng):
        import dataclasses

        from scda_tpu.config import ModelConfig
        from scda_tpu.models.faster_rcnn import pool_rois

        feat = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
        rois = jnp.asarray(rng.rand(2, 3, 4).astype(np.float32) * 60)
        rois = rois.at[..., 2:].add(rois[..., :2] + 16)
        cfg = ModelConfig(pooling_mode="crop", pooling_size=5)
        out = pool_rois(feat, rois, None, cfg)
        assert out.shape == (6, 5, 5, 4)
        assert np.isfinite(np.asarray(out)).all()


class TestMultiscalePallasDispatch:
    def test_multiscale_pallas_matches_einsum(self, rng):
        """pool_rois_multiscale's roi_pallas branch (added r3: the
        stride-8 einsum intermediate is ~1.1 GB HBM at res101 scale)
        must agree with the einsum path."""
        import dataclasses

        from jax.experimental.pallas import tpu as pltpu

        from scda_tpu.config import ModelConfig
        from scda_tpu.models.faster_rcnn import pool_rois_multiscale

        b, r = 1, 6
        f8 = jnp.asarray(rng.randn(b, 16, 24, 128).astype(np.float32))
        f16 = jnp.asarray(rng.randn(b, 8, 12, 128).astype(np.float32))
        rois = jnp.asarray(
            np.stack([random_rois(rng, r, 8 * 16, 12 * 16)]))
        mc = ModelConfig(ms_fine_threshold=60.0, compute_dtype="float32")

        a = pool_rois_multiscale(f8, f16, rois, mc)
        mc_p = dataclasses.replace(mc, roi_pallas=True)
        with pltpu.force_tpu_interpret_mode():
            bql = pool_rois_multiscale(f8, f16, rois, mc_p)
        np.testing.assert_allclose(np.asarray(bql), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)

    def test_pool_fine_raw_pallas_matches_einsum(self, rng):
        """pool_fine_raw (the un-projected stride-8 align feeding the
        proj-after-pool commute) must agree across its pallas/einsum
        gate, and its weight-mass output must be exactly 1 for interior
        rois."""
        import dataclasses

        from jax.experimental.pallas import tpu as pltpu

        from scda_tpu.config import ModelConfig
        from scda_tpu.models.faster_rcnn import pool_fine_raw

        b, r = 1, 5
        f8 = jnp.asarray(rng.randn(b, 16, 24, 128).astype(np.float32))
        rois = jnp.asarray(
            np.stack([random_rois(rng, r, 8 * 16, 12 * 16)]))
        mc = ModelConfig(compute_dtype="float32")

        a, wsum_a = pool_fine_raw(f8, rois, mc)
        mc_p = dataclasses.replace(mc, roi_pallas=True)
        with pltpu.force_tpu_interpret_mode():
            p, wsum_p = pool_fine_raw(f8, rois, mc_p)
        np.testing.assert_allclose(np.asarray(p), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(wsum_p), np.asarray(wsum_a))
        # random_rois produces in-image boxes: full bilinear mass.
        np.testing.assert_allclose(np.asarray(wsum_a), 1.0, rtol=1e-6)


class TestPallasWTiling:
    def test_w_tiled_accumulation_matches_single_chunk(self, rng):
        """Multi-chunk W-tiling (r3: bounds VMEM for big maps like the
        res101 stride-8 level) must accumulate to the single-chunk
        result exactly."""
        from scda_tpu.ops.pallas.roi_align_kernel import roi_align_contract
        from scda_tpu.ops.roi_ops import roi_align_axis_weights

        b, h, w, c, r, p = 1, 8, 16, 8, 5, 7
        feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        rois = jnp.asarray(
            np.stack([random_rois(rng, r, h * 16, w * 16)]))
        wy, wx = roi_align_axis_weights(rois, h, w, output_size=p)
        full = roi_align_contract(wy, wx, feat, r_tile=4, interpret=True)
        for wt in (8, 4, 2):
            tiled = roi_align_contract(wy, wx, feat, r_tile=4,
                                       interpret=True, w_tile=wt)
            np.testing.assert_allclose(np.asarray(tiled),
                                       np.asarray(full),
                                       rtol=1e-6, atol=1e-6)

    def test_w_padding_when_tile_does_not_divide(self, rng):
        """W with no aligned divisor (e.g. 132 = 4*3*11 on real maps,
        13 here) is zero-padded up to a tile multiple instead of falling
        back to one giant chunk (r3 fix: the fallback blew the VMEM
        budget the tiling exists to bound).  Padded columns carry zero
        wx weight, so only chunked-accumulation rounding may differ."""
        from scda_tpu.ops.pallas.roi_align_kernel import roi_align_contract
        from scda_tpu.ops.roi_ops import roi_align_axis_weights

        b, h, w, c, r, p = 1, 8, 13, 8, 5, 7
        feat = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        rois = jnp.asarray(
            np.stack([random_rois(rng, r, h * 16, w * 16)]))
        wy, wx = roi_align_axis_weights(rois, h, w, output_size=p)
        full = roi_align_contract(wy, wx, feat, r_tile=4, interpret=True)
        for wt in (4, 8):   # 13 % 4 != 0 -> pads to 16
            padded = roi_align_contract(wy, wx, feat, r_tile=4,
                                        interpret=True, w_tile=wt)
            np.testing.assert_allclose(np.asarray(padded),
                                       np.asarray(full),
                                       rtol=1e-6, atol=1e-6)
