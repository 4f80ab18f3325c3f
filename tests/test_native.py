"""Native C++ data-prep library vs the numpy reference implementation.

The C++ kernel (scda_tpu/native/prep.cc) and the numpy fallback
(_resize_bilinear_np + mean/paste in pipeline.py) implement the same
half-pixel bilinear math; these tests pin their equality and the IoU
helper against core.boxes.
"""

import numpy as np
import pytest

from scda_tpu import native
from scda_tpu.config import DataConfig
from scda_tpu.data.pipeline import _resize_bilinear_np, prepare_image

needs_native = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native disabled"
)


class TestNativePrep:
    @needs_native
    def test_matches_numpy_resize(self, rng):
        img = rng.rand(37, 53, 3).astype(np.float32) * 255
        mean = np.array([10.0, 20.0, 30.0], np.float32)
        out = native.prep_image_native(img, (64, 96), (48, 72), mean)
        ref = np.zeros((64, 96, 3), np.float32)
        ref[:48, :72] = _resize_bilinear_np(img, 48, 72) - mean
        np.testing.assert_allclose(out, ref, rtol=5e-3, atol=2e-3)

    @needs_native
    def test_flip_matches_numpy(self, rng):
        img = rng.rand(20, 30, 3).astype(np.float32) * 255
        mean = np.zeros(3, np.float32)
        out = native.prep_image_native(img, (16, 24), (16, 24), mean,
                                       flip=True)
        ref = np.zeros((16, 24, 3), np.float32)
        ref[:16, :24] = _resize_bilinear_np(img[:, ::-1, :], 16, 24)
        np.testing.assert_allclose(out, ref, rtol=5e-3, atol=2e-3)

    @needs_native
    def test_identity_size(self, rng):
        img = rng.rand(8, 8, 3).astype(np.float32)
        mean = np.zeros(3, np.float32)
        out = native.prep_image_native(img, (8, 8), (8, 8), mean)
        np.testing.assert_allclose(out, img, rtol=1e-6, atol=1e-6)

    @needs_native
    def test_bbox_overlaps_matches_jax(self, rng):
        from scda_tpu.core.boxes import bbox_overlaps

        a = rng.rand(17, 4).astype(np.float32) * 100
        a[:, 2:] += a[:, :2] + 1
        b = rng.rand(9, 4).astype(np.float32) * 100
        b[:, 2:] += b[:, :2] + 1
        np.testing.assert_allclose(
            native.bbox_overlaps_native(a, b),
            np.asarray(bbox_overlaps(a, b)),
            rtol=1e-5, atol=1e-6,
        )

    def test_prepare_image_both_paths_agree(self, rng, monkeypatch):
        if not native.available():
            pytest.skip("native unavailable")
        img = rng.rand(100, 160, 3).astype(np.float32) * 255
        cfg = DataConfig(scale=64, max_size=128, image_size=(64, 128))
        c_native, s1, hw1 = prepare_image(img, cfg)
        monkeypatch.setenv("SCDA_NATIVE", "0")
        monkeypatch.setattr(native, "_tried", True)
        monkeypatch.setattr(native, "_lib", None)
        c_np, s2, hw2 = prepare_image(img, cfg)
        monkeypatch.setattr(native, "_tried", False)
        assert s1 == s2 and hw1 == hw2
        np.testing.assert_allclose(c_native, c_np, rtol=5e-3, atol=2e-3)
