"""Pallas fused train-mode BatchNorm (ops/bn_pallas.py).

Numerics are pinned against flax ``nn.BatchNorm`` / a reference jnp
implementation: forward values, batch statistics, running-stat updates
and the full three-term backward.  Kernels run in interpreter mode on
CPU (the real lowering is exercised by the TPU benchmarks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_shot_detection_tpu.ops import bn_pallas


@pytest.fixture(autouse=True)
def interpret_mode():
    bn_pallas._INTERPRET[0] = True
    yield
    bn_pallas._INTERPRET[0] = False


def _ref_bn(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=tuple(range(x.ndim - 1)))
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(xf), axis=tuple(range(x.ndim - 1)))
        - jnp.square(mu))
    z = (xf - mu) * jax.lax.rsqrt(var + eps) * g + b
    return z.astype(x.dtype), mu, var


def test_forward_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 16, 16, 64) * 2 + 0.3, jnp.float32)
    g = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    b = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    z1, m1, v1 = _ref_bn(x, g, b)
    z2, m2, v2 = bn_pallas.fused_bn_train(x, g, b)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)


def test_backward_matches_reference():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 24, 32), jnp.float32)
    g = jnp.asarray(rng.rand(32) + 0.5, jnp.float32)
    b = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)

    def loss(fn):
        return lambda args: jnp.sum(jnp.sin(fn(*args)[0]))

    g1 = jax.grad(loss(_ref_bn))((x, g, b))
    g2 = jax.grad(loss(bn_pallas.fused_bn_train))((x, g, b))
    for name, a, bb in zip(('dx', 'dgamma', 'dbeta'), g1, g2):
        a, bb = np.asarray(a), np.asarray(bb)
        tol = 1e-4 * max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a, bb, atol=tol, err_msg=name)


def test_bf16_input_f32_stats():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 16), jnp.bfloat16)
    g = jnp.ones((16,), jnp.float32)
    b = jnp.zeros((16,), jnp.float32)
    z, mean, var = bn_pallas.fused_bn_train(x, g, b)
    assert z.dtype == jnp.bfloat16
    assert mean.dtype == jnp.float32 and var.dtype == jnp.float32
    z1, m1, v1 = _ref_bn(x, g, b)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z, jnp.float32),
                               np.asarray(z1, jnp.float32), atol=2e-2)


def test_interceptor_matches_flax_bn_on_vgg():
    """The full apply-level override: forward stages, batch-stat updates
    and parameter gradients agree with plain flax BN on a real model."""
    from single_shot_detection_tpu.models.vgg import VGG, VGG_CONFIGS
    mod = VGG(config=VGG_CONFIGS[11], use_bn=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), x, train=False, max_stage=8)
    fused = bn_pallas.fused_bn_apply(mod)

    out1, mut1 = mod.apply(v, x, train=True, max_stage=8,
                           mutable=['batch_stats'])
    out2, mut2 = fused(v, x, train=True, max_stage=8,
                       mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(out1[0][8]),
                               np.asarray(out2[0][8]), atol=1e-4)
    for k in ('mean', 'var'):
        np.testing.assert_allclose(
            np.asarray(mut1['batch_stats']['bn0'][k]),
            np.asarray(mut2['batch_stats']['bn0'][k]), atol=1e-5)

    def L(apply_fn):
        def f(p):
            out, _ = apply_fn(
                {'params': p, 'batch_stats': v['batch_stats']},
                x, train=True, max_stage=8, mutable=['batch_stats'])
            return jnp.sum(jnp.square(out[0][8]))
        return f

    g1 = jax.grad(L(mod.apply))(v['params'])
    g2 = jax.grad(L(fused))(v['params'])
    for (path, l1), (_, l2) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0]):
        name = jax.tree_util.keystr(path)
        if 'conv' in name and name.endswith("['bias']"):
            continue  # BN absorbs conv bias: grads are cancellation noise
        a, b = np.asarray(l1), np.asarray(l2)
        tol = 1e-4 * max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a, b, atol=tol, err_msg=name)


def test_eval_mode_untouched():
    """use_running_average=True must fall through to flax (the fused path
    is train-only by design)."""
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.BatchNorm(use_running_average=not train)(x)

    m = M()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 16),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    fused = bn_pallas.fused_bn_apply(m)
    np.testing.assert_array_equal(
        np.asarray(m.apply(v, x, train=False)),
        np.asarray(fused(v, x, train=False)))


def test_row_block_picker():
    assert bn_pallas._pick_rows(1440000, 64, 2) % 16 == 0
    assert 1440000 % bn_pallas._pick_rows(1440000, 64, 2) == 0
    assert bn_pallas._pick_rows(17, 64, 2) == 0  # prime: no aligned divisor
