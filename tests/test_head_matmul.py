"""Matmul-reformulated bottleneck / RoI head (resnet.Bottleneck
matmul=True, cfg.model.head_matmul): the explicit-MXU-contraction path
must be numerically the conv path with an identical parameter tree.

Reference lineage: lib/model/faster_rcnn/resnet.py:~100 (Bottleneck) +
~250 (_head_to_tail); the reformulation itself is TPU-first math, see
RESULTS.md (stacked-tap stem precedent).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scda_tpu.models.backbones.resnet import Bottleneck, ResNetC4Head


def _init_pair(module_a, module_b, x):
    pa = module_a.init(jax.random.key(0), x)["params"]
    pb = module_b.init(jax.random.key(0), x)["params"]
    return pa, pb


@pytest.mark.parametrize("stride,downsample", [(1, False), (2, True)])
def test_bottleneck_matmul_param_tree_identical(rng, stride, downsample):
    x = jnp.asarray(rng.randn(2, 7, 7, 64).astype(np.float32))
    conv = Bottleneck(16, stride=stride, downsample=downsample,
                      dtype=jnp.float32)
    mm = Bottleneck(16, stride=stride, downsample=downsample,
                    dtype=jnp.float32, matmul=True)
    pa, pb = _init_pair(conv, mm, x)
    sa = jax.tree.map(lambda t: (t.shape, t.dtype), pa)
    sb = jax.tree.map(lambda t: (t.shape, t.dtype), pb)
    assert sa == sb, "matmul path must declare the exact nn.Conv tree"


@pytest.mark.parametrize("stride,downsample", [(1, False), (2, True)])
def test_bottleneck_matmul_matches_conv_f32(rng, stride, downsample):
    x = jnp.asarray(rng.randn(3, 7, 7, 64).astype(np.float32))
    conv = Bottleneck(16, stride=stride, downsample=downsample,
                      dtype=jnp.float32)
    mm = Bottleneck(16, stride=stride, downsample=downsample,
                    dtype=jnp.float32, matmul=True)
    params = conv.init(jax.random.key(1), x)["params"]
    # Break the fresh-init symmetry of the FrozenBatchNorm stats.
    params = jax.tree.map(
        lambda t: t + 0.01 * np.arange(t.size, dtype=np.float32
                                       ).reshape(t.shape) % 0.37, params)
    a = conv.apply({"params": params}, x)
    b = mm.apply({"params": params}, x)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_bottleneck_matmul_matches_conv_bf16(rng):
    x = jnp.asarray(rng.randn(3, 7, 7, 64).astype(np.float32))
    conv = Bottleneck(16, stride=2, downsample=True, dtype=jnp.bfloat16)
    mm = Bottleneck(16, stride=2, downsample=True, dtype=jnp.bfloat16,
                    matmul=True)
    params = conv.init(jax.random.key(1), x)["params"]
    a = np.asarray(conv.apply({"params": params}, x), np.float32)
    b = np.asarray(mm.apply({"params": params}, x), np.float32)
    scale = np.abs(a).max() + 1e-6
    np.testing.assert_allclose(a / scale, b / scale, atol=0.02)


def test_head_matmul_full_layer4_parity(rng):
    """Full 3-block layer4 head at a scaled-down RoI-head shape, f32."""
    pooled = jnp.asarray(rng.randn(6, 7, 7, 128).astype(np.float32))
    conv = ResNetC4Head(depth=50, dtype=jnp.float32)
    mm = ResNetC4Head(depth=50, dtype=jnp.float32, matmul=True)
    params = conv.init(jax.random.key(2), pooled)["params"]
    a = conv.apply({"params": params}, pooled)
    b = mm.apply({"params": params}, pooled)
    assert a.shape == b.shape == (6, 2048)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-4)


def test_head_matmul_grads_flow(rng):
    """layer4 trains (it is the RoI head) — grads through the matmul
    path must match the conv path."""
    pooled = jnp.asarray(rng.randn(2, 7, 7, 64).astype(np.float32))
    conv = Bottleneck(16, stride=2, downsample=True, dtype=jnp.float32)
    mm = Bottleneck(16, stride=2, downsample=True, dtype=jnp.float32,
                    matmul=True)
    params = conv.init(jax.random.key(3), pooled)["params"]

    def loss(m):
        return lambda p: jnp.sum(m.apply({"params": p}, pooled) ** 2)

    ga = jax.grad(loss(conv))(params)
    gb = jax.grad(loss(mm))(params)

    def check(path, a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(check, ga, gb)
