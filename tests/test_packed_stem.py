"""Column-pair-packed VGG stem (models/vgg.py ``packed_stem``).

The packed stem is a pure LAYOUT change: same parameter tree, same
forward values, same batch statistics, same gradients (up to float
reassociation).  C=64 tensors physically half-fill the TPU's 128-wide
lane tiles, so evaluating stage 1 in the ``[B, H, W/2, 128]`` packed
layout halves the stem's HBM traffic on the bandwidth-bound train step
(docs/PERF.md round-5 measurement).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_shot_detection_tpu.models.vgg import VGG, VGG_CONFIGS


@pytest.fixture(scope='module')
def setup():
    cfg = VGG_CONFIGS[16]
    plain = VGG(config=cfg, use_bn=True)
    packed = VGG(config=cfg, use_bn=True, packed_stem=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False,
                           max_stage=32)
    return plain, packed, x, variables


def test_variable_trees_identical(setup):
    plain, packed, x, v = setup
    v2 = packed.init(jax.random.PRNGKey(0), x, train=False, max_stage=32)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v2)):
        assert np.shape(a) == np.shape(b)


def test_forward_and_stats_match(setup):
    plain, packed, x, v = setup
    out_p, mut_p = plain.apply(v, x, train=True, max_stage=32,
                               mutable=['batch_stats'])
    out_q, mut_q = packed.apply(v, x, train=True, max_stage=32,
                                mutable=['batch_stats'])
    a, b = np.asarray(out_p[0][32]), np.asarray(out_q[0][32])
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    # post-stem stages are bitwise-comparable layouts; stage 7 is the
    # second conv block's conv output (first plain-layout stage)
    np.testing.assert_allclose(np.asarray(out_p[0][7]),
                               np.asarray(out_q[0][7]),
                               atol=1e-4, rtol=1e-4)
    for layer in ('bn0', 'bn1'):
        for k in ('mean', 'var'):
            np.testing.assert_allclose(
                np.asarray(mut_p['batch_stats'][layer][k]),
                np.asarray(mut_q['batch_stats'][layer][k]),
                atol=1e-5, rtol=1e-5)


def test_gradients_match(setup):
    plain, packed, x, v = setup

    def loss(mod):
        def f(params):
            out, _ = mod.apply(
                {'params': params, 'batch_stats': v['batch_stats']},
                x, train=True, max_stage=32, mutable=['batch_stats'])
            return jnp.mean(jnp.square(out[0][32].astype(jnp.float32)))
        return f

    g1 = jax.grad(loss(plain))(v['params'])
    g2 = jax.grad(loss(packed))(v['params'])
    for (path, l1), (_, l2) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0]):
        name = jax.tree_util.keystr(path)
        a, b = np.asarray(l1), np.asarray(l2)
        if name.endswith("['bias']") and 'conv' in name:
            # conv-bias grads under BN are theoretically ZERO (the BN
            # mean-subtraction absorbs any bias shift); what remains is
            # float cancellation noise, which reassociation perturbs at
            # 100% relative scale — compare against the post-BN grads'
            # magnitude instead
            assert np.abs(a - b).max() < 1e-2
            continue
        # channel-sum grads (BN beta/gamma) are cancellation-heavy: use a
        # tensor-norm-scaled absolute tolerance, not per-element relative
        tol = 2e-3 * max(float(np.abs(a).max()), 1.0)
        np.testing.assert_allclose(a, b, atol=tol, err_msg=name)


def test_eval_mode_matches(setup):
    plain, packed, x, v = setup
    out_p, _ = plain.apply(v, x, train=False, max_stage=32,
                           mutable=[])
    out_q, _ = packed.apply(v, x, train=False, max_stage=32,
                            mutable=[])
    np.testing.assert_allclose(np.asarray(out_p[0][32]),
                               np.asarray(out_q[0][32]),
                               atol=1e-4, rtol=1e-4)


def test_stem_tap_refused(setup):
    _, packed, x, _ = setup
    with pytest.raises(ValueError, match='packed_stem'):
        packed.init(jax.random.PRNGKey(0), x, train=False, max_stage=3)
