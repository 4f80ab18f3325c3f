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

    def test_init_no_duplicate_centers(self, rng):
        # The k-means++-style init must not start two centres on the
        # same point while distinct valid points remain (the old
        # independent-uniform init collided occasionally and froze
        # empty clusters — VERDICT r3 weak #6).
        from scda_tpu.core.kmeans import _init_centers

        pts = jnp.array(rng.randn(40, 2).astype(np.float32))
        mask = jnp.ones((40,), bool)
        for seed in range(20):
            c = np.asarray(_init_centers(pts, mask, 9,
                                         jax.random.key(seed)))
            d = np.linalg.norm(c[:, None] - c[None, :], axis=-1)
            d[np.diag_indices(9)] = np.inf
            assert d.min() > 0, f"duplicate init centres at seed {seed}"
        # deterministic (farthest-point) path too
        c = np.asarray(_init_centers(pts, mask, 9, None))
        d = np.linalg.norm(c[:, None] - c[None, :], axis=-1)
        d[np.diag_indices(9)] = np.inf
        assert d.min() > 0

    def test_no_empty_clusters_on_separated_data(self, rng):
        # 9 well-separated blobs, K=9: every cluster must end non-empty
        # for every seed (the spread init guarantees one centre per
        # blob basin almost surely; duplicates previously broke this).
        grid = np.array([[i * 50.0, j * 50.0]
                         for i in range(3) for j in range(3)], np.float32)
        pts = np.concatenate(
            [g + 0.5 * rng.randn(20, 2).astype(np.float32) for g in grid])
        for seed in range(10):
            _, _, counts = kmeans(jnp.array(pts), 9, iters=15,
                                  key=jax.random.key(seed))
            assert int(np.asarray(counts).min()) > 0, seed

    def test_init_respects_mask(self, rng):
        from scda_tpu.core.kmeans import _init_centers

        pts = np.concatenate([rng.randn(20, 2),
                              1e4 + np.zeros((20, 2))]).astype(np.float32)
        mask = jnp.array([True] * 20 + [False] * 20)
        for key in (None, jax.random.key(3)):
            c = np.asarray(_init_centers(jnp.array(pts), mask, 5, key))
            assert np.abs(c).max() < 100  # never picks an invalid point

    def test_spread_init_selectable(self, rng):
        # The legacy quantile-spread init stays selectable
        # (adapt.kmeans_init="spread") for counterfactual A/Bs; it must
        # produce valid clusterings (all valid points counted, centres
        # only from valid points) on both the random and det paths.
        pts = np.concatenate([rng.randn(30, 2),
                              1e4 + np.zeros((10, 2))]).astype(np.float32)
        mask = jnp.array([True] * 30 + [False] * 10)
        for key in (None, jax.random.key(5)):
            centers, _, counts = kmeans(jnp.array(pts), 4, mask=mask,
                                        iters=8, key=key, init="spread")
            assert int(np.asarray(counts).sum()) == 30
            assert np.abs(np.asarray(centers)).max() < 100
        try:
            kmeans(jnp.array(pts), 4, init="nope")
        except ValueError:
            pass
        else:
            raise AssertionError("unknown init must raise")

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
