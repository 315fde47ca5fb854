"""GPipe pipeline parallelism (parallel/pipeline.py, train.pipeline_sharding).

Beyond-parity: the reference has no pipeline story (SURVEY.md §2.8).  The
forward is pinned against the plain (unstaged) detector forward, and the
BACKWARD pipeline — derived purely by autodiff through the scan/ppermute
schedule — is pinned against plain gradients.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_shot_detection_tpu.models import builder
from single_shot_detection_tpu.parallel import create_mesh, make_pipeline_apply
from single_shot_detection_tpu.train.engine import Experiment
from single_shot_detection_tpu.utils.config import load_config

SMOKE = os.path.join(os.path.dirname(__file__), '..', 'samples',
                     'synthetic_smoke.py')

IMG = 64
NUM_CLASSES = 3

_CACHE = {}


def _bundle_and_vars():
    """Tiny detector + init, built once per test process."""
    if 'bundle' not in _CACHE:
        bundle = builder.build(
            base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
            anchor_generator={'type': 'ssd', 'num_scales': 1,
                              'min_scale': 0.3, 'max_scale': 0.9,
                              'aspect_ratios': [[1.0]]},
            num_classes=NUM_CLASSES,
            features={'name': 'Features', 'out_layers': (18,)},
            input_size=(IMG, IMG))
        _CACHE['bundle'] = bundle
        _CACHE['variables'] = bundle.init(jax.random.PRNGKey(0),
                                          batch_size=16)
    return _CACHE['bundle'], _CACHE['variables']


@pytest.mark.parametrize('microbatches', [1, 2, 4])
def test_pipeline_forward_matches_plain(rng, microbatches):
    """The staged, microbatched forward reproduces the plain forward —
    including the degenerate 1-microbatch schedule (pure stage split)."""
    bundle, variables = _bundle_and_vars()
    mesh = create_mesh(n_data=4, n_model=2)
    papply = make_pipeline_apply(bundle.module, mesh,
                                 microbatches=microbatches)
    images = jnp.asarray(rng.rand(16, IMG, IMG, 3).astype(np.float32))
    ref_s, ref_l = bundle.module.apply(variables, images, train=False)
    pp_s, pp_l = papply(variables, images)
    np.testing.assert_allclose(np.asarray(pp_s), np.asarray(ref_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pp_l), np.asarray(ref_l),
                               atol=1e-5)


@pytest.mark.slow
def test_pipeline_grad_matches_plain(rng):
    """Autodiff through the scan/ppermute schedule IS the GPipe backward:
    gradients match the plain forward's (bubble ticks contribute exactly
    zero because their outputs are never selected into the result)."""
    bundle, variables = _bundle_and_vars()
    params, stats = variables['params'], variables['batch_stats']
    mesh = create_mesh(n_data=4, n_model=2)
    papply = make_pipeline_apply(bundle.module, mesh, microbatches=4)
    images = jnp.asarray(rng.rand(16, IMG, IMG, 3).astype(np.float32))

    def loss_plain(p):
        s, l = bundle.module.apply({'params': p, 'batch_stats': stats},
                                   images, train=False)
        return jnp.sum(s ** 2) + jnp.sum(jnp.abs(l))

    def loss_pp(p):
        s, l = papply({'params': p, 'batch_stats': stats}, images)
        return jnp.sum(s ** 2) + jnp.sum(jnp.abs(l))

    g_plain = jax.grad(loss_plain)(params)
    g_pp = jax.grad(loss_pp)(params)
    scale = max(float(jnp.abs(x).max())
                for x in jax.tree_util.tree_leaves(g_plain))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4 * scale),
        g_plain, g_pp)


@pytest.mark.slow
def test_pipeline_composes_with_group_norm(rng):
    """train.group_norm + train.pipeline_sharding: the GN trace-time
    override threads through the staged forward (stage kwargs forwarded),
    matching the unpipelined GN forward."""
    from single_shot_detection_tpu.models import norm
    bundle, variables = _bundle_and_vars()
    gn_apply = norm.group_norm_apply(bundle.module)
    mesh = create_mesh(n_data=4, n_model=2)
    papply = make_pipeline_apply(bundle.module, mesh, microbatches=2,
                                 apply=gn_apply)
    images = jnp.asarray(rng.rand(16, IMG, IMG, 3).astype(np.float32))
    ref_s, ref_l = gn_apply(variables, images, train=False)
    pp_s, pp_l = papply(variables, images)
    np.testing.assert_allclose(np.asarray(pp_s), np.asarray(ref_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pp_l), np.asarray(ref_l),
                               atol=1e-5)


def test_pipeline_validation():
    bundle, variables = _bundle_and_vars()
    with pytest.raises(ValueError, match='model axis of >= 2'):
        make_pipeline_apply(bundle.module, create_mesh(n_data=8, n_model=1),
                            microbatches=2)
    mesh = create_mesh(n_data=4, n_model=2)
    papply = make_pipeline_apply(bundle.module, mesh, microbatches=4)
    images = jnp.zeros((8, IMG, IMG, 3), jnp.float32)  # 8 % (4*4) != 0
    with pytest.raises(ValueError, match='must divide'):
        papply(variables, images)
    with pytest.raises(ValueError, match='train=False'):
        papply(variables, jnp.zeros((16, IMG, IMG, 3)), train=True)


def _one_step_cfg(pipeline):
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 1
    cfg.config.train['eval_every'] = 1
    cfg.config.train['num_batches_per_epoch'] = 1
    cfg.config.train['frozen_bn'] = True  # the pipeline training regime
    if pipeline:
        cfg.config.train['pipeline_sharding'] = pipeline
    return cfg


@pytest.mark.slow
def test_engine_pipeline_matches_single_device():
    """train.pipeline_sharding through the PRODUCT path: a (4, 2)-mesh
    2-stage GPipe schedule reproduces the single-device frozen-BN train +
    eval results (same one-step rationale as the data-parallel test)."""
    train_losses, eval_results = [], []
    for pp in (0, 2):
        exp = Experiment(_one_step_cfg(pp), phases=['train', 'eval'],
                         debug=True,
                         devices=None if pp else [jax.devices()[0]])
        assert exp.mesh.shape['model'] == (2 if pp else 1)
        if pp:
            assert exp.pipeline_apply is not None
        rows = exp.train()
        train_losses.append(rows[-1]['train_loss'])
        eval_results.append((rows[-1]['eval_loss'], rows[-1]['eval_mAP']))
    np.testing.assert_allclose(train_losses[0], train_losses[1], rtol=2e-4)
    np.testing.assert_allclose(eval_results[0][0], eval_results[1][0],
                               rtol=2e-4)
    assert eval_results[0][1] == eval_results[1][1]  # mAP is discrete-ranked


def test_engine_pipeline_requires_nonmutating_norm():
    cfg = _one_step_cfg(2)
    cfg.config.train['frozen_bn'] = False
    with pytest.raises(ValueError, match='non-mutating forward'):
        Experiment(cfg, phases=['train'], debug=True)


def test_engine_pipeline_rejects_other_model_axis_owners():
    cfg = _one_step_cfg(2)
    cfg.config.train['tensor_sharding'] = 2
    with pytest.raises(ValueError, match='at most one'):
        Experiment(cfg, phases=['train'], debug=True)


def test_engine_pipeline_rejects_nondividing_microbatches():
    cfg = _one_step_cfg(3)  # per-device batch 2 on the (4, 2) mesh
    with pytest.raises(ValueError, match='microbatches must divide'):
        Experiment(cfg, phases=['train'], debug=True)


def _m2det_bundle_and_vars():
    """Tiny M2Det (MLFPN, 4 TUMs, 3 scales) for the deep-pipeline tests."""
    if 'm2det' not in _CACHE:
        bundle = builder.build(
            base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
            anchor_generator={'type': 'ssd', 'num_scales': 3,
                              'min_scale': 0.2, 'max_scale': 0.9,
                              'aspect_ratios': [[1.0]] * 3},
            num_classes=NUM_CLASSES,
            features={'name': 'MultilevelFeaturePyramid',
                      'out_layers': (13, 18), 'num_scales': 3,
                      'num_tums': 4,
                      'base_reduced_channels': (64, 128),
                      'reduced_channels': 32,
                      'tum': {'inner_channels': 32, 'out_channels': 16}},
            input_size=(IMG, IMG))
        _CACHE['m2det'] = bundle
        _CACHE['m2det_vars'] = bundle.init(jax.random.PRNGKey(0),
                                           batch_size=8)
    return _CACHE['m2det'], _CACHE['m2det_vars']


@pytest.mark.parametrize('n_model,microbatches', [(4, 2), (2, 2)])
def test_pipeline_deep_m2det_matches_plain(rng, n_model, microbatches):
    """The N-stage schedule (TUM-chain segments, models/detector.py
    n_stages + MLFPN tum_range) reproduces the plain M2Det forward —
    at 4 stages (backbone+TUM0 | TUM1 | TUM2 | TUM3+SFAM+heads) and the
    universal 2-stage seam."""
    bundle, variables = _m2det_bundle_and_vars()
    mesh = create_mesh(n_data=8 // n_model, n_model=n_model)
    papply = make_pipeline_apply(bundle.module, mesh,
                                 microbatches=microbatches)
    images = jnp.asarray(rng.rand(8, IMG, IMG, 3).astype(np.float32))
    ref_s, ref_l = bundle.module.apply(variables, images, train=False)
    pp_s, pp_l = papply(variables, images)
    np.testing.assert_allclose(np.asarray(pp_s), np.asarray(ref_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pp_l), np.asarray(ref_l),
                               atol=1e-5)


def test_deep_stages_need_mlfpn():
    """>2 stages on a non-MLFPN detector raises the clear n_stages error
    (there is no TUM chain to split)."""
    bundle, variables = _bundle_and_vars()
    papply = make_pipeline_apply(bundle.module,
                                 create_mesh(n_data=2, n_model=4),
                                 microbatches=2)
    with pytest.raises(ValueError, match='supports 2 stages'):
        papply(variables, jnp.zeros((16, IMG, IMG, 3), jnp.float32))


def test_tum_stage_chunks():
    from single_shot_detection_tpu.models.detector import tum_stage_chunks
    assert tum_stage_chunks(8, 4) == [(0, 2), (2, 4), (4, 6), (6, 8)]
    assert tum_stage_chunks(8, 3) == [(0, 3), (3, 6), (6, 8)]
    assert tum_stage_chunks(2, 3) == [(0, 1), (1, 2), (2, 2)]
    # degenerate: fewer TUMs than stages -> empty interior segments, which
    # pass the chain state through unchanged (still correct, just wasteful)
    assert tum_stage_chunks(1, 3) == [(0, 1), (1, 1), (1, 1)]
