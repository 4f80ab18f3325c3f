"""Tests for on-device k-means and gradient reversal."""

import numpy as np
import jax
import jax.numpy as jnp

from scda_tpu.core.kmeans import kmeans
from scda_tpu.core.grad_reverse import grad_reverse, scaled_gradient


class TestKMeans:
    def test_separated_clusters_recovered(self, rng):
        true_centers = np.array([[0, 0], [100, 0], [0, 100], [100, 100]],
                                np.float32)
        pts = np.concatenate(
            [c + rng.randn(40, 2).astype(np.float32) for c in true_centers]
        )
        centers, assign, counts = kmeans(jnp.array(pts), 4, iters=20)
        centers = np.asarray(centers)
        # each true center has a recovered center nearby
        for c in true_centers:
            d = np.linalg.norm(centers - c, axis=1).min()
            assert d < 3.0, (c, centers)
        assert np.asarray(counts).sum() == 160
        # points in same true cluster get same label
        a = np.asarray(assign)
        for g in range(4):
            labels = a[g * 40 : (g + 1) * 40]
            assert (labels == labels[0]).all()

    def test_mask_excludes_points(self, rng):
        pts = np.concatenate(
            [rng.randn(30, 2), 50 + rng.randn(30, 2), 1e3 + np.zeros((10, 2))]
        ).astype(np.float32)
        mask = np.array([True] * 60 + [False] * 10)
        centers, _, counts = kmeans(jnp.array(pts), 2, mask=jnp.array(mask),
                                    iters=15)
        c = np.asarray(centers)
        assert np.abs(c).max() < 100  # outlier block never pulled a center
        assert np.asarray(counts).sum() == 60

    def test_jit_and_random_init(self, rng):
        pts = rng.randn(64, 2).astype(np.float32)
        fn = jax.jit(lambda p, k: kmeans(p, 3, iters=5, key=k))
        centers, assign, counts = fn(jnp.array(pts), jax.random.key(0))
        assert centers.shape == (3, 2)
        assert int(np.asarray(counts).sum()) == 64

    def test_counts_match_assignment(self, rng):
        pts = rng.randn(50, 2).astype(np.float32)
        _, assign, counts = kmeans(jnp.array(pts), 5, iters=8)
        a = np.asarray(assign)
        c = np.asarray(counts)
        for g in range(5):
            assert (a == g).sum() == c[g]


class TestGradReverse:
    def test_forward_identity(self, rng):
        x = jnp.array(rng.randn(4, 5).astype(np.float32))
        np.testing.assert_allclose(np.asarray(grad_reverse(x, 0.7)),
                                   np.asarray(x))

    def test_gradient_flipped_and_scaled(self, rng):
        x = jnp.array(rng.randn(8).astype(np.float32))

        def f(x):
            return jnp.sum(grad_reverse(x, 2.5) ** 2)

        g = jax.grad(f)(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(-2.5 * 2 * x),
                                   rtol=1e-6)

    def test_scaled_gradient(self, rng):
        x = jnp.array(rng.randn(8).astype(np.float32))
        g = jax.grad(lambda x: jnp.sum(scaled_gradient(x, 0.3) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(0.3 * 2 * x),
                                   rtol=1e-6)

    def test_composes_with_jit_vmap(self, rng):
        x = jnp.array(rng.randn(3, 4).astype(np.float32))
        f = jax.jit(jax.vmap(jax.grad(lambda v: jnp.sum(grad_reverse(v, 1.0)))))
        g = f(x)
        np.testing.assert_allclose(np.asarray(g), -np.ones((3, 4)), rtol=1e-6)
