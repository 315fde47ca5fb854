"""GroupNorm override (train.group_norm, models/norm.py): every BatchNorm
application runs as GroupNorm over the same affine params, with BN's exact
variable tree preserved (checkpoint/import/pruning layout compatibility)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_shot_detection_tpu.models.layers import ConvBn
from single_shot_detection_tpu.models.norm import (_num_groups,
                                                   group_norm_apply)
from single_shot_detection_tpu.train.engine import Experiment
from single_shot_detection_tpu.utils.config import load_config

SMOKE = os.path.join(os.path.dirname(__file__), '..', 'samples',
                     'synthetic_smoke.py')


def test_num_groups_fallback():
    assert _num_groups(16, 8) == 8
    assert _num_groups(6, 4) == 3      # largest divisor <= 4
    assert _num_groups(7, 8) == 7      # prime width: per-channel groups
    assert _num_groups(4, 32) == 4     # fewer channels than groups
    assert _num_groups(1, 8) == 1


def test_interceptor_semantics_and_tree(rng):
    m = ConvBn(features=16, kernel_size=3, padding=1, activation=None)
    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    gn = group_norm_apply(m, groups=4)

    y = gn(v, x, train=False)
    # scale=1, bias=0 at init -> per-(sample, group) moments are 0/1
    yg = np.asarray(y).reshape(2, 8, 8, 4, 4)
    np.testing.assert_allclose(yg.mean(axis=(1, 2, 4)), 0.0, atol=1e-5)
    np.testing.assert_allclose(yg.std(axis=(1, 2, 4)), 1.0, atol=1e-3)
    # differs from the BN forward (which uses batch statistics here)
    yb = m.apply(v, x, train=False)
    assert float(jnp.abs(y - yb).max()) > 1e-3

    # affine params are BN's own: doubling scale doubles the output
    v2 = jax.tree_util.tree_map(lambda a: a, v)
    v2 = {'params': {'conv': v['params']['conv'],
                     'bn': {'scale': v['params']['bn']['scale'] * 2.0,
                            'bias': v['params']['bn']['bias']}},
          'batch_stats': v['batch_stats']}
    np.testing.assert_allclose(np.asarray(gn(v2, x, train=False)),
                               2.0 * np.asarray(y), atol=1e-5)

    # train apply under mutable keeps the full batch_stats tree, untouched
    y2, mut = gn(v, x, train=True, mutable=['batch_stats'])
    assert (jax.tree_util.tree_structure(mut['batch_stats'])
            == jax.tree_util.tree_structure(v['batch_stats']))
    for a, b in zip(jax.tree_util.tree_leaves(mut['batch_stats']),
                    jax.tree_util.tree_leaves(v['batch_stats'])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # train == eval (no running statistics, no mode divergence)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-6)


def test_engine_group_norm_trains_and_checkpoints(tmp_path):
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 1
    cfg.config.train['eval_every'] = 1
    cfg.config.train['group_norm'] = True
    exp = Experiment(cfg, phases=['train', 'eval'], debug=False,
                     checkpoint_dir=str(tmp_path),
                     devices=[jax.devices()[0]])
    assert exp.gn_groups == 8 and exp.apply_override is exp.gn_apply
    rows = exp.train()
    assert np.isfinite(rows[-1]['train_loss'])
    assert 'eval_mAP' in rows[-1]
    # GN never writes the running statistics
    for leaf in jax.tree_util.tree_leaves(exp.state.batch_stats):
        a = np.asarray(leaf)
        assert np.all((a == 0.0) | (a == 1.0))

    # the checkpoint restores into a plain-BN experiment (identical tree)
    cfg2 = load_config(SMOKE)
    cfg2.config.train['epochs'] = 1
    exp2 = Experiment(cfg2, phases=['eval'], debug=True,
                      resume_from=str(tmp_path),
                      devices=[jax.devices()[0]])
    for a, b in zip(jax.tree_util.tree_leaves(exp.state.params),
                    jax.tree_util.tree_leaves(exp2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_group_norm_predict_and_export(tmp_path):
    from single_shot_detection_tpu.export import export_model, load_exported

    cfg = load_config(SMOKE)
    cfg.config.train['group_norm'] = {'groups': 4}
    exp = Experiment(cfg, phases=['eval'], debug=True,
                     devices=[jax.devices()[0]])
    assert exp.gn_groups == 4
    # single-image facade runs the GN forward
    img = (np.random.RandomState(0).rand(200, 260, 3) * 255) \
        .astype(np.uint8)
    dets = exp.predict(img)
    assert dets.ndim == 2 and dets.shape[1] == 6

    # the exported artifact bakes the GN forward: it must agree with the
    # engine's predict_step (which runs apply_override), and DISAGREE with
    # a plain-BN artifact on the same weights
    variables = {'params': exp.state.params,
                 'batch_stats': exp.state.batch_stats}
    imgs = jnp.asarray(np.random.RandomState(1)
                       .rand(1, *exp.input_size, 3).astype(np.float32))
    dets_eng, valid_eng = exp.predict_step(variables, imgs)

    path = export_model(exp, str(tmp_path / 'model'), with_postprocess=True)
    dets_art, valid_art = load_exported(path)(variables, imgs)
    np.testing.assert_allclose(np.asarray(dets_eng), np.asarray(dets_art),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(valid_eng),
                                  np.asarray(valid_art))

    exp_bn = Experiment(load_config(SMOKE), phases=['eval'], debug=True,
                        devices=[jax.devices()[0]])
    bn_scores, _ = exp_bn.bundle.module.apply(variables, imgs, train=False)
    gn_scores, _ = exp.gn_apply(variables, imgs, train=False)
    assert float(jnp.abs(bn_scores - gn_scores).max()) > 1e-4


def test_group_norm_rejects_incompatible_modes():
    cfg = load_config(SMOKE)
    cfg.config.train['group_norm'] = True
    cfg.config.train['qat'] = True
    with pytest.raises(ValueError, match='group_norm'):
        Experiment(cfg, phases=['train'], debug=True,
                   devices=[jax.devices()[0]])

    cfg = load_config(SMOKE)
    cfg.config.train['group_norm'] = True
    cfg.config.train['frozen_bn'] = True
    with pytest.raises(ValueError, match='frozen_bn'):
        Experiment(cfg, phases=['train'], debug=True,
                   devices=[jax.devices()[0]])
