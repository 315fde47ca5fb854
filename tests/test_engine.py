"""Engine-level: experiment wiring, resume, determinism, export."""

import os
import textwrap

import jax
import numpy as np
import pytest

from single_shot_detection_tpu.train.engine import Experiment
from single_shot_detection_tpu.utils.config import load_config


SMOKE = os.path.join(os.path.dirname(__file__), '..', 'samples',
                     'synthetic_smoke.py')

RETINA_SMOKE = """
seed = 23
model = {
    'base': {'name': 'torchvision_resnet18'},
    'detector': {
        'num_classes': 4,
        'features': {'name': 'FeaturePyramid', 'out_layers': (5, 6, 7),
                     'pyramid_layers': 3, 'pyramid_channels': 64},
        'predictor': {'num_layers': 1, 'num_channels': 64},
        'heads': {'score_head_bias_init': -4.6},
    },
    'anchor_generator': {'type': 'retina_net', 'min_level': 3, 'max_level': 5,
                         'aspect_ratios': [1.0, 2.0], 'scale': 4.0,
                         'scales_per_level': 1},
}
box_coder = {'xy_scale': 10.0, 'wh_scale': 5.0}
sampler = {'name': 'naive_sampler'}
loss = {
    'classification_loss': {'name': 'SigmoidFocalLoss', 'gamma': 2.0,
                            'alpha': 0.25},
    'localization_loss': {'name': 'SmoothL1Loss'},
}
postprocess = {'score_threshold': 0.05, 'max_total': 20,
               'nms': {'max_per_class': 10, 'overlap_threshold': 0.5},
               'score_converter': 'SIGMOID'}
target_assigner = {'matched_threshold': 0.5, 'unmatched_threshold': 0.4}
augmentations = [{'name': 'RandomHorizontalFlip'}]
preprocessing = [
    {'name': 'ToFloatTensor', 'args': {'normalize': True}},
    {'name': 'Normalize', 'args': {'mean': [0.485, 0.456, 0.406],
                                   'std': [0.229, 0.224, 0.225]}},
]
input_size = (96, 96)
dataset = {
    'train': {'name': 'Synthetic', 'num_images': 8, 'image_size': 96,
              'num_classes': 5, 'max_boxes': 2, 'seed': 1},
    'eval': {'name': 'Synthetic', 'num_images': 4, 'image_size': 96,
             'num_classes': 5, 'max_boxes': 2, 'seed': 2},
}
batch_size = 4
shuffle = True
num_workers = 1
train = {'epochs': 1, 'eval_every': 1, 'max_gt': 4,
         'optimizer': {'name': 'SGD', 'lr': 1e-3, 'momentum': 0.9}}
"""


def test_retina_focal_path_trains_and_evals(tmp_path):
    cfg_path = tmp_path / 'retina.py'
    cfg_path.write_text(RETINA_SMOKE)
    cfg = load_config(str(cfg_path))
    exp = Experiment(cfg, phases=['train', 'eval'], debug=True)
    rows = exp.train()
    assert np.isfinite(rows[-1]['train_loss'])
    assert 'eval_mAP' in rows[-1]


def test_checkpoint_resume_roundtrip(tmp_path):
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 2
    cfg.config.train['eval_every'] = 99
    exp = Experiment(cfg, phases=['train'], checkpoint_dir=str(tmp_path),
                     debug=False)
    exp.save_every = 1
    exp.train()
    files = [f for f in os.listdir(tmp_path) if f.endswith('.msgpack')]
    assert files, 'no checkpoints written'

    cfg2 = load_config(SMOKE)
    cfg2.config.train['epochs'] = 2
    exp2 = Experiment(cfg2, phases=['train'], checkpoint_dir=str(tmp_path),
                      resume_from=str(tmp_path), debug=True)
    assert exp2.start_epoch == 2
    assert int(exp2.state.step) == int(exp.state.step)
    a = jax.tree_util.tree_leaves(exp.state.params)
    b = jax.tree_util.tree_leaves(exp2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_weights_only(tmp_path):
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 1
    cfg.config.train['eval_every'] = 99
    exp = Experiment(cfg, phases=['train'], checkpoint_dir=str(tmp_path))
    exp.save_every = 1
    exp.train()

    cfg2 = load_config(SMOKE)
    exp2 = Experiment(cfg2, phases=['train'], resume_from=str(tmp_path),
                      load_weights=True, debug=True)
    assert exp2.start_epoch == 0  # fresh counters
    a = jax.tree_util.tree_leaves(exp.state.params)
    b = jax.tree_util.tree_leaves(exp2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resume_bitwise_matches_uninterrupted(tmp_path):
    """Interrupt-and-resume equals the uninterrupted run BITWISE: per-step
    RNG folds from (epoch, step) (engine._epoch_batches), loader shuffling
    from (seed, epoch) (data/loader.py), and the lr schedule reads the
    restored optimizer step — so a crash + emergency checkpoint + restart
    loses nothing.  The scheduler horizon is pinned to a constant so the
    shorter first leg compiles the same schedule as the straight run."""
    def make(epochs):
        cfg = load_config(SMOKE)
        cfg.config.train['epochs'] = epochs
        cfg.config.train['eval_every'] = 99
        cfg.config.train['scheduler'] = {
            'name': 'CosineAnnealingWithWarmupLR', 'run_each_step': True,
            'T_max': 8, 'warmup_steps': 4, 'warmup_lr': 1e-4}
        return cfg

    exp_a = Experiment(make(2), phases=['train'], debug=True)
    exp_a.train()

    ckdir = str(tmp_path)
    exp_b = Experiment(make(1), phases=['train'], checkpoint_dir=ckdir,
                       debug=False)
    exp_b.save_every = 1
    exp_b.train()
    exp_b2 = Experiment(make(2), phases=['train'], resume_from=ckdir,
                        checkpoint_dir=ckdir, debug=True)
    assert exp_b2.start_epoch == 1
    exp_b2.train()

    assert int(exp_a.state.step) == int(exp_b2.state.step)
    for tree_a, tree_b in ((exp_a.state.params, exp_b2.state.params),
                           (exp_a.state.batch_stats,
                            exp_b2.state.batch_stats)):
        for x, y in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_determinism_same_seed(tmp_path):
    losses = []
    for _ in range(2):
        cfg = load_config(SMOKE)
        cfg.config.train['epochs'] = 1
        cfg.config.train['eval_every'] = 99
        exp = Experiment(cfg, phases=['train'], debug=True)
        rows = exp.train()
        losses.append(rows[-1]['train_loss'])
    assert losses[0] == losses[1]


def test_export_stablehlo_roundtrip(tmp_path):
    from single_shot_detection_tpu.export import export_model, load_exported
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 0
    exp = Experiment(cfg, phases=['train'], debug=True)
    path = export_model(exp, str(tmp_path / 'model'))
    assert os.path.exists(path)
    infer = load_exported(path)
    import jax.numpy as jnp
    variables = {'params': exp.state.params,
                 'batch_stats': exp.state.batch_stats}
    probs, boxes = infer(variables, jnp.zeros((1, 128, 128, 3)))
    assert probs.shape[-1] == 5
    assert boxes.shape[-1] == 4
    assert np.isfinite(np.asarray(probs)).all()


def test_predict_single_image(tmp_path):
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 0
    exp = Experiment(cfg, phases=['train'], debug=True)
    img = (np.random.RandomState(0).rand(200, 260, 3) * 255).astype(np.uint8)
    dets = exp.predict(img)
    assert dets.ndim == 2 and dets.shape[1] == 6
    # boxes are rescaled toward source resolution (the reference doesn't
    # clip decoded boxes either, detector_wrapper.py:62-63) — sanity-bound
    if len(dets):
        assert np.abs(dets[:, :4]).max() < 4 * 260
        assert (dets[:, 4] >= 1).all()


def test_export_with_postprocess(tmp_path):
    from single_shot_detection_tpu.export import export_model, load_exported
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 0
    exp = Experiment(cfg, phases=['train'], debug=True)
    path = export_model(exp, str(tmp_path / 'model_pp'), with_postprocess=True)
    infer = load_exported(path)
    import jax.numpy as jnp
    variables = {'params': exp.state.params,
                 'batch_stats': exp.state.batch_stats}
    dets, valid = infer(variables, jnp.zeros((1, 128, 128, 3)))
    assert dets.shape[-1] == 6 and valid.dtype == np.bool_ or valid.dtype == bool


def test_export_standalone_artifact(tmp_path):
    """``standalone`` export: weights + normalization + NMS baked into one
    artifact whose signature is raw-RGB images -> final detections; must
    agree with the framework path (normalize then non-baked artifact)."""
    from single_shot_detection_tpu.export import (
        export_model, load_exported, load_exported_with_spec)
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 0
    exp = Experiment(cfg, phases=['train'], debug=True)
    path = export_model(exp, str(tmp_path / 'standalone'),
                        with_postprocess=True, with_preprocess=True,
                        bake_variables=True)
    call, in_avals = load_exported_with_spec(path)
    assert len(in_avals) == 1, 'weights must be baked in'
    assert tuple(in_avals[0].shape) == (1, 128, 128, 3)

    raw = (np.random.RandomState(3).rand(1, 128, 128, 3) * 255
           ).astype(np.float32)
    dets_a, valid_a = call(raw)

    # framework path: normalize by hand, run the plain artifact
    ref_path = export_model(exp, str(tmp_path / 'plain'),
                            with_postprocess=True)
    pipe = exp.eval_pipeline
    normed = (raw / pipe.divisor - np.asarray(pipe.mean)) / np.asarray(pipe.std)
    variables = {'params': exp.state.params,
                 'batch_stats': exp.state.batch_stats}
    dets_b, valid_b = load_exported(ref_path)(variables,
                                              normed.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(valid_a), np.asarray(valid_b))
    np.testing.assert_allclose(np.asarray(dets_a), np.asarray(dets_b),
                               atol=1e-5)


def test_infer_exported_cli(tmp_path, capsys):
    """tools/infer_exported.py consumes a standalone artifact with no
    config/checkpoint — the deployment-side demo.py analog."""
    import importlib.util
    from single_shot_detection_tpu.export import export_model
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 0
    exp = Experiment(cfg, phases=['train'], debug=True)
    path = export_model(exp, str(tmp_path / 'standalone'),
                        with_postprocess=True, with_preprocess=True,
                        bake_variables=True)
    tool = os.path.join(os.path.dirname(__file__), '..', 'tools',
                        'infer_exported.py')
    spec = importlib.util.spec_from_file_location('infer_exported', tool)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.main([path, '--synthetic', '--min-score', '0.0']) == 0
    out = capsys.readouterr().out
    assert 'artifact expects [1, 128, 128, 3]' in out
    assert 'synthetic[0]:' in out


def test_video_viewer_headless(tmp_path):
    from PIL import Image
    from single_shot_detection_tpu.utils.video_viewer import VideoViewer
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 0
    exp = Experiment(cfg, phases=['train'], debug=True)
    frames = tmp_path / 'frames'
    frames.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (100, 120, 3), np.uint8)).save(
            frames / f'{i}.jpg')
    viewer = VideoViewer(str(frames), exp)
    # headless (no DISPLAY): the viewer saves annotated frames instead of
    # calling cv2.imshow (which aborts at C level without a display)
    os.environ.pop('DISPLAY', None)
    viewer.run()
    saved = sorted(os.listdir('/tmp/ssd_tpu_frames'))
    assert len(saved) >= 2


def test_gradient_accumulation_via_engine(tmp_path):
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 1
    cfg.config.train['eval_every'] = 99
    cfg.config.train['accumulation_steps'] = 2
    exp = Experiment(cfg, phases=['train'], debug=True)
    rows = exp.train()
    assert np.isfinite(rows[-1]['train_loss'])
    # 4 micro-steps / 2 = 2 optimizer updates recorded by MultiSteps, but
    # state.step counts micro-steps (parity: global_step counts updates —
    # the optimizer holds between accumulation boundaries)
    assert int(exp.state.step) == 4


def test_engine_data_parallel_matches_single_device():
    """The PRODUCT train/eval path (Experiment) on the 8-device mesh must
    reproduce single-device results — data parallelism in the engine itself,
    not just in a hand-built step.

    One step only: hard-negative mining is rank-based, so float
    reduction-order noise amplifies chaotically across steps by design."""
    train_losses, eval_results = [], []
    for devs in ([jax.devices()[0]], None):
        cfg = load_config(SMOKE)
        cfg.config.train['epochs'] = 1
        cfg.config.train['eval_every'] = 1
        cfg.config.train['num_batches_per_epoch'] = 1
        exp = Experiment(cfg, phases=['train', 'eval'], debug=True,
                         devices=devs)
        assert exp.mesh.devices.size == (1 if devs else 8)
        rows = exp.train()
        train_losses.append(rows[-1]['train_loss'])
        eval_results.append((rows[-1]['eval_loss'], rows[-1]['eval_mAP']))
    # only float reduction-order differences are allowed
    np.testing.assert_allclose(train_losses[0], train_losses[1], rtol=2e-4)
    np.testing.assert_allclose(eval_results[0][0], eval_results[1][0],
                               rtol=2e-4)
    assert eval_results[0][1] == eval_results[1][1]  # mAP is discrete-ranked


def test_engine_tensor_sharding_matches_single_device():
    """train.tensor_sharding through the PRODUCT path: a (4, 2) mesh with
    conv channels sharded over 'model' reproduces the single-device train +
    eval results (same one-step rationale as the data-parallel test)."""
    train_losses, eval_results = [], []
    for tp in (0, 2):
        cfg = load_config(SMOKE)
        cfg.config.train['epochs'] = 1
        cfg.config.train['eval_every'] = 1
        cfg.config.train['num_batches_per_epoch'] = 1
        if tp:
            cfg.config.train['tensor_sharding'] = tp
        exp = Experiment(cfg, phases=['train', 'eval'], debug=True,
                         devices=None if tp else [jax.devices()[0]])
        assert exp.mesh.shape['model'] == (tp or 1)
        if tp:
            import jax.tree_util as jtu
            assert any(not s.is_fully_replicated for s in
                       jtu.tree_leaves(exp._state_sharding.params))
        rows = exp.train()
        train_losses.append(rows[-1]['train_loss'])
        eval_results.append((rows[-1]['eval_loss'], rows[-1]['eval_mAP']))
    np.testing.assert_allclose(train_losses[0], train_losses[1], rtol=2e-4)
    np.testing.assert_allclose(eval_results[0][0], eval_results[1][0],
                               rtol=2e-4)
    assert eval_results[0][1] == eval_results[1][1]


def test_engine_spatial_sharding_matches_single_device():
    """train.spatial_sharding through the PRODUCT path: a (4, 2) mesh with
    image heights sharded over 'model' (GSPMD conv halos) reproduces the
    single-device train + eval results."""
    train_losses, eval_results = [], []
    for sp in (0, 2):
        cfg = load_config(SMOKE)
        cfg.config.train['epochs'] = 1
        cfg.config.train['eval_every'] = 1
        cfg.config.train['num_batches_per_epoch'] = 1
        if sp:
            cfg.config.train['spatial_sharding'] = sp
        exp = Experiment(cfg, phases=['train', 'eval'], debug=True,
                         devices=None if sp else [jax.devices()[0]])
        assert exp.mesh.shape['model'] == (sp or 1)
        rows = exp.train()
        train_losses.append(rows[-1]['train_loss'])
        eval_results.append((rows[-1]['eval_loss'], rows[-1]['eval_mAP']))
    np.testing.assert_allclose(train_losses[0], train_losses[1], rtol=2e-4)
    np.testing.assert_allclose(eval_results[0][0], eval_results[1][0],
                               rtol=2e-4)
    assert eval_results[0][1] == eval_results[1][1]


def test_spatial_sharding_rejects_bad_configs():
    cfg = load_config(SMOKE)
    cfg.config.train['spatial_sharding'] = 2
    cfg.config.train['tensor_sharding'] = 2
    with pytest.raises(ValueError, match='at most one'):
        Experiment(cfg, phases=['train'], debug=True)

    cfg = load_config(SMOKE)
    cfg.config.train['spatial_sharding'] = 2
    cfg.config.train['staging_colorspace'] = 'yuv420'
    with pytest.raises(ValueError, match='YUV420'):
        Experiment(cfg, phases=['train'], debug=True)

    cfg = load_config(SMOKE)
    cfg.config.train['spatial_sharding'] = 7  # 128 % 7 != 0
    with pytest.raises(ValueError, match='divide'):
        Experiment(cfg, phases=['train'], debug=True)


def test_engine_async_checkpoint(tmp_path):
    """train.async_checkpoint: scheduled saves drain in a background
    thread off an on-device snapshot; train() returns only after the last
    write is durable, and the checkpoint restores bit-equal to the final
    state (the snapshot copy protects against the next step's donation)."""
    from single_shot_detection_tpu.train import checkpoint as ckpt_mod

    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 2
    cfg.config.train['eval_every'] = 99
    cfg.config.train['save_every'] = 1
    cfg.config.train['async_checkpoint'] = True
    exp = Experiment(cfg, phases=['train'], debug=False,
                     checkpoint_dir=str(tmp_path),
                     devices=[jax.devices()[0]])
    assert exp._async_saver is not None
    exp.train()

    names = [n for n in os.listdir(str(tmp_path)) if n.endswith('.msgpack')]
    assert len(names) == 2  # one per epoch
    path = ckpt_mod.find_latest(str(tmp_path))
    restored, meta = ckpt_mod.restore(path, exp.state)
    assert meta['epoch'] == 1
    for a, b in zip(jax.tree_util.tree_leaves(exp.state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_saver_surfaces_background_failure(tmp_path):
    from single_shot_detection_tpu.train import checkpoint as ckpt_mod
    from single_shot_detection_tpu.train.state import create_train_state
    from single_shot_detection_tpu.train import optimizers
    from single_shot_detection_tpu.models import builder

    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 1, 'min_scale': 0.3,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]]},
        num_classes=3,
        features={'name': 'Features', 'out_layers': (18,)},
        input_size=(64, 64))
    tx = optimizers.create_optimizer({'name': 'SGD', 'lr': 1e-2})
    state = create_train_state(bundle.init(jax.random.PRNGKey(0)), tx)

    blocker = tmp_path / 'not_a_dir'
    blocker.write_text('x')  # makedirs inside save() will fail on this
    saver = ckpt_mod.AsyncSaver()
    saver.save(str(blocker), state, epoch=0)
    with pytest.raises(Exception):
        saver.wait()
    # the error is consumed: the saver is reusable afterwards
    saver.save(str(tmp_path / 'ok'), state, epoch=0)
    saver.wait()
    assert ckpt_mod.find_latest(str(tmp_path / 'ok'))


def test_train_loss_is_true_epoch_mean():
    """log.csv train_loss must be the exact mean over every step, not a
    subsampled sum with a mismatched denominator."""
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 1
    cfg.config.train['eval_every'] = 99
    exp = Experiment(cfg, phases=['train'], debug=True)
    recorded = []
    orig = exp.train_step

    def spy(state, batch, rng):
        state, m = orig(state, batch, rng)
        recorded.append(float(m['loss']))
        return state, m

    exp.train_step = spy
    rows = exp.train()
    assert recorded, 'no steps ran'
    np.testing.assert_allclose(rows[-1]['train_loss'], np.mean(recorded),
                               rtol=1e-6)


def test_loader_propagates_worker_errors():
    from single_shot_detection_tpu.data.loader import Loader

    class Broken:
        annotations = [{'image_path': ''}] * 4

        def __len__(self):
            return 4

        def load_image(self, i):
            if i == 2:
                raise ValueError('corrupt image')
            return np.zeros((10, 10, 3), np.uint8)

        def boxes(self, i):
            return np.zeros((0, 6), np.float32)

    loader = Loader(Broken(), batch_size=2, staging_size=(10, 10),
                    num_workers=1)
    with pytest.raises(ValueError, match='corrupt image'):
        for _ in loader:
            pass


MB2_WEIGHT_SMOKE = """
seed = 23
model = {{
    'base': {{'name': 'torchvision_mobilenet_v2', 'weight': {weight!r}}},
    'detector': {{
        'num_classes': 5, 'use_depthwise': True,
        'features': {{'name': 'Features', 'out_layers': (13, 18)}},
        'extras': {{'layers': (('s', 64),)}},
    }},
    'anchor_generator': {{'type': 'ssd', 'num_scales': 3, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0, 2.0]] * 3}},
}}
box_coder = {{'xy_scale': 10.0, 'wh_scale': 5.0}}
sampler = {{'name': 'naive_sampler'}}
loss = {{'classification_loss': {{'name': 'CrossEntropyLoss'}},
         'localization_loss': {{'name': 'SmoothL1Loss'}}}}
postprocess = {{'score_threshold': 0.05, 'max_total': 10,
                'nms': {{'max_per_class': 5, 'overlap_threshold': 0.5}}}}
target_assigner = {{'matched_threshold': 0.5, 'unmatched_threshold': 0.5}}
augmentations = []
preprocessing = [{{'name': 'ToFloatTensor', 'args': {{'normalize': True}}}}]
input_size = (96, 96)
dataset = {{'train': {{'name': 'Synthetic', 'num_images': 8, 'image_size': 96,
                       'num_classes': 5, 'max_boxes': 2, 'seed': 1}}}}
batch_size = 4
num_workers = 1
train = {{'epochs': 0, 'optimizer': {{'name': 'SGD', 'lr': 1e-3}}}}
"""


def test_engine_loads_base_weight_from_config(tmp_path):
    """A config requesting base.weight must actually load it (round-1 gap:
    the key was silently stripped)."""
    import torch
    from single_shot_detection_tpu.models import builder
    from test_torch_import import synthetic_mbv2_state_dict

    bundle = builder.build(
        base={'name': 'torchvision_mobilenet_v2'},
        anchor_generator={'type': 'ssd', 'num_scales': 3, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0, 2.0]] * 3},
        num_classes=5, use_depthwise=True,
        features={'name': 'Features', 'out_layers': (13, 18)},
        extras={'layers': (('s', 64),)},
        input_size=(96, 96))
    variables = bundle.init(jax.random.PRNGKey(0))
    sd = synthetic_mbv2_state_dict(variables, np.random.RandomState(3))
    sd_path = tmp_path / 'mb2.pt'
    torch.save(sd, str(sd_path))

    cfg_path = tmp_path / 'cfg.py'
    cfg_path.write_text(MB2_WEIGHT_SMOKE.format(weight=str(sd_path)))
    exp = Experiment(load_config(str(cfg_path)), phases=['train'], debug=True)

    kernel = np.asarray(
        exp.state.params['features']['base']['stage0']['conv']['kernel'])
    expected = sd['features.0.0.weight'].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(kernel, expected)
    mean = np.asarray(
        exp.state.batch_stats['features']['base']['stage0']['bn']['mean'])
    np.testing.assert_array_equal(mean,
                                  sd['features.0.1.running_mean'].numpy())


def _pruning_smoke_cfg(criterion):
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 2
    cfg.config.train['eval_every'] = 99
    cfg.config.train['pruner'] = {
        'include_paths': ['features'],
        'criterion': criterion,
        'num': 2,
        'observe_every': 1,
    }
    return cfg


@pytest.mark.parametrize('criterion', [
    {'name': 'TaylorExpansion'},
    {'name': 'MeanActivation'},
])
def test_data_dependent_pruning_criterions_fed_by_engine(criterion):
    """Configuring TaylorExpansion/MeanActivation must actually prune
    channels (round-1 gap: observe/observe_grads had no caller, so these
    criterions scored nothing)."""
    exp = Experiment(_pruning_smoke_cfg(criterion), phases=['train'],
                     debug=True)
    exp.train()
    pruned = sum(len(d) for d in exp.pruner.dead.values())
    assert pruned > 0, f'{criterion["name"]} pruned nothing'
    # pruned channels are exactly zero in the params
    from single_shot_detection_tpu.train import pruning
    for path, dead in exp.pruner.dead.items():
        kernel = np.asarray(pruning._get(exp.state.params, path))
        for c in dead:
            assert np.abs(kernel[..., c]).sum() == 0.0


def test_fused_steps_train():
    """lax.scan-fused multi-step dispatch: same epoch semantics, k steps per
    XLA call (remainder runs unfused)."""
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 1
    cfg.config.train['eval_every'] = 99
    cfg.config.train['fused_steps'] = 3  # 4 steps -> one chunk + remainder
    exp = Experiment(cfg, phases=['train'], debug=True)
    rows = exp.train()
    assert np.isfinite(rows[-1]['train_loss'])
    assert int(exp.state.step) == 4  # all batches trained


def test_eval_only_with_interpolated_scheduler():
    """Eval/export-only runs must still interpolate '{total_train_steps}'
    in scheduler configs (the reference computes it up front,
    main.py:70-73) — regression: this used to crash building the engine."""
    cfg = load_config(SMOKE)
    cfg.config.train = dict(cfg.config.train)
    cfg.config.train['scheduler'] = {
        'name': 'CosineAnnealingWithWarmupLR', 'run_each_step': True,
        'T_max': '{total_train_steps}', 'warmup_steps': 2,
        'warmup_lr': 1e-4}
    exp = Experiment(cfg, phases=['eval'], debug=True)
    metrics = exp.evaluate()
    assert 'mAP' in metrics


def test_export_uses_materialized_pruned_model(tmp_path):
    """After pruning, the export phase serializes the physically-narrow
    model; its outputs equal the masked training model's."""
    import jax.numpy as jnp
    from single_shot_detection_tpu.export import export_model, load_exported
    exp = Experiment(_pruning_smoke_cfg({'name': 'MinL1Norm'}),
                     phases=['train'], debug=True)
    exp.train()
    assert exp.pruner.dead

    path = export_model(exp, str(tmp_path / 'model'))
    infer = load_exported(path)

    narrow_bundle, narrow_vars = exp.materialize_pruned()
    narrow_vars = jax.tree_util.tree_map(jnp.asarray, narrow_vars)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 128, 128, 3))
    probs, boxes = infer(narrow_vars, x)

    masked_scores, masked_locs = exp.bundle.module.apply(
        {'params': exp.state.params, 'batch_stats': exp.state.batch_stats},
        x, train=False)
    expected = jax.nn.softmax(masked_scores.astype(jnp.float32), -1)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(expected),
                               rtol=1e-3, atol=1e-4)


def test_restores_committed_learning_checkpoint():
    """Checkpoint-format stability + learning evidence, pinned in CI: the
    committed 150-epoch synthetic run (experiments/, f32, mAP 0.671) must
    restore through the current engine and still score well above chance."""
    exp_dir = os.path.join(os.path.dirname(__file__), '..', 'experiments',
                           '2026-08-16-225820')
    if not os.path.isdir(exp_dir):
        pytest.skip('learning-evidence experiment not present')
    cfg = load_config(os.path.join(exp_dir, 'config.py'))
    exp = Experiment(cfg, phases=['eval'], debug=True, resume_from=exp_dir)
    metrics = exp.evaluate()
    assert metrics['mAP'] > 0.5, metrics


def test_interrupt_saves_emergency_checkpoint(tmp_path, monkeypatch):
    """Ctrl-C mid-training leaves a resumable checkpoint."""
    cfg = load_config(SMOKE)
    cfg.config.train = dict(cfg.config.train)
    cfg.config.train['epochs'] = 50
    cfg.config.train['save_every'] = 999
    exp = Experiment(cfg, phases=['train'], debug=False,
                     checkpoint_dir=str(tmp_path))
    calls = {'n': 0}
    orig = exp.train_step

    def bomb(*args, **kwargs):
        calls['n'] += 1
        if calls['n'] >= 3:
            raise KeyboardInterrupt
        return orig(*args, **kwargs)

    exp.train_step = bomb
    with pytest.raises(KeyboardInterrupt):
        exp.train()
    from single_shot_detection_tpu.train import checkpoint as ckpt
    assert ckpt.find_latest(exp.checkpoint_dir) is not None


def test_checkpoint_key_migration(tmp_path):
    """model_fixer analog (reference rules.py:10-20): a checkpoint whose
    param paths predate a rename restores through MIGRATION_RULES-style
    rewrite rules — params, batch_stats and optimizer slots alike."""
    import jax.numpy as jnp
    import optax

    from single_shot_detection_tpu.train import checkpoint as ckpt
    from single_shot_detection_tpu.train.state import TrainState

    tx = optax.sgd(1e-2, momentum=0.9)  # momentum: opt_state mirrors params
    old_params = {'features_v1': {'conv': {'kernel': jnp.ones((1, 1, 2, 3))}}}
    old_state = TrainState(step=jnp.asarray(5, jnp.int32), params=old_params,
                           batch_stats={'features_v1': {'bn': {
                               'mean': jnp.full((3,), 2.0)}}},
                           opt_state=tx.init(old_params),
                           lr_scale=jnp.asarray(1.0, jnp.float32))
    path = ckpt.save(str(tmp_path), old_state, epoch=7)

    new_params = {'features': {'conv': {'kernel': jnp.zeros((1, 1, 2, 3))}}}
    template = TrainState(step=jnp.asarray(0, jnp.int32), params=new_params,
                          batch_stats={'features': {'bn': {
                              'mean': jnp.zeros((3,))}}},
                          opt_state=tx.init(new_params),
                          lr_scale=jnp.asarray(1.0, jnp.float32))

    rules = [(r'(^|/)features_v1(/|$)', r'\1features\2')]
    restored, meta = ckpt.restore(path, template, rules=rules)
    assert meta['epoch'] == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params['features']['conv']['kernel']), 1.0)
    np.testing.assert_array_equal(
        np.asarray(restored.batch_stats['features']['bn']['mean']), 2.0)

    # without rules the stale checkpoint must fail loudly, not silently
    with pytest.raises(Exception):
        ckpt.restore(path, template, rules=[])


def test_checkpoint_migration_chain_and_collision():
    """Chain renames (a->b while b->c) migrate cleanly; two sources landing
    on one destination fail loudly instead of silently dropping a tensor."""
    from single_shot_detection_tpu.train.checkpoint import migrate_state_dict

    raw = {'params': {'blk1': {'k': np.ones(2)}, 'blk2': {'k': np.full(2, 2.0)}}}
    # both raw keys are stale: blk2 shifts to blk3 while blk1 shifts to blk2
    # — the rewrite target of one rule is itself a source of another, which
    # must NOT be flagged as a collision (no tensor is dropped)
    template = {'params': {'blk3': {'k': np.zeros(2)}}}
    rules = [(r'(^|/)blk2(/|$)', r'\1blk3\2'),
             (r'(^|/)blk1(/|$)', r'\1blk2\2')]
    out = migrate_state_dict(raw, template, rules=rules)
    np.testing.assert_array_equal(out['params']['blk2']['k'], 1.0)
    np.testing.assert_array_equal(out['params']['blk3']['k'], 2.0)

    # two stale keys rewriting onto the same destination: loud failure
    bad_rules = [(r'(^|/)blk1(/|$)', r'\1blk3\2'),
                 (r'(^|/)blk2(/|$)', r'\1blk3\2')]
    with pytest.raises(ValueError, match='migration collision'):
        migrate_state_dict(raw, template, rules=bad_rules)


def test_transient_backend_failure_continues(tmp_path):
    """A transient relay/backend error mid-epoch checkpoints and continues
    with the next epoch instead of killing the run; a non-transient error
    still propagates."""
    cfg = load_config(SMOKE)
    cfg.config.train['epochs'] = 3
    cfg.config.train['eval_every'] = 99
    exp = Experiment(cfg, phases=['train'], checkpoint_dir=str(tmp_path),
                     debug=False)
    exp.save_every = 99

    real = exp._epoch_batches
    calls = {'n': 0}

    def flaky(loader, num_batches, epoch):
        calls['n'] += 1
        if calls['n'] == 2:  # epoch 1 dies mid-flight
            raise jax.errors.JaxRuntimeError(
                'INVALID_ARGUMENT: fake relay transfer failure')
        return real(loader, num_batches, epoch)

    exp._epoch_batches = flaky
    rows = exp.train()
    assert [r['epoch'] for r in rows] == [0, 2]  # epoch 1 skipped, run lived
    assert any(f.startswith('ckpt-') for f in os.listdir(tmp_path))

    # non-transient errors must propagate
    exp2 = Experiment(load_config(SMOKE), phases=['train'], debug=True)

    def broken(loader, num_batches, epoch):
        raise jax.errors.JaxRuntimeError('XLA compilation failure: bad shape')

    exp2._epoch_batches = broken
    with pytest.raises(jax.errors.JaxRuntimeError):
        exp2.train()

    # INVALID_ARGUMENT on the FIRST epoch is ambiguous (XLA uses it for
    # deterministic program bugs too) and must propagate, not be skipped
    exp3 = Experiment(load_config(SMOKE), phases=['train'], debug=True)

    def first_epoch_invalid(loader, num_batches, epoch):
        raise jax.errors.JaxRuntimeError('INVALID_ARGUMENT: parameter '
                                         'size mismatch')

    exp3._epoch_batches = first_epoch_invalid
    with pytest.raises(jax.errors.JaxRuntimeError):
        exp3.train()

    # ... and a transiently-SKIPPED epoch does not count as success: after
    # an UNAVAILABLE skip on epoch 0, an INVALID_ARGUMENT on epoch 1 is
    # still ambiguous (no epoch ever completed) and must propagate
    cfg4 = load_config(SMOKE)
    cfg4.config.train['epochs'] = 3
    exp4 = Experiment(cfg4, phases=['train'], debug=True)

    def skip_then_invalid(loader, num_batches, epoch):
        if epoch == 0:
            raise jax.errors.JaxRuntimeError('UNAVAILABLE: relay hiccup')
        raise jax.errors.JaxRuntimeError('INVALID_ARGUMENT: parameter '
                                         'size mismatch')

    exp4._epoch_batches = skip_then_invalid
    with pytest.raises(jax.errors.JaxRuntimeError, match='INVALID_ARGUMENT'):
        exp4.train()


def test_matmul_precision_policy():
    """f32 policy defaults to true-f32 matmuls (the PARITY.md finding:
    XLA's silent one-pass-bf16 lowering of f32 matmuls was the whole
    cross-framework training gap); bf16 leaves the XLA default; an
    explicit knob or an ambient (env/caller) setting wins."""
    from single_shot_detection_tpu.train import engine as engine_mod

    prev = jax.config.jax_default_matmul_precision
    prev_flag = engine_mod._MATMUL_PRECISION_SET_BY_ENGINE
    prev_user = engine_mod._USER_AMBIENT_MATMUL_PRECISION
    prev_write = engine_mod._ENGINE_LAST_MATMUL_WRITE

    def reset(ambient=None, engine_set=False, user_ambient=None,
              last_write=None):
        jax.config.update('jax_default_matmul_precision', ambient)
        engine_mod._MATMUL_PRECISION_SET_BY_ENGINE = engine_set
        engine_mod._USER_AMBIENT_MATMUL_PRECISION = user_ambient
        engine_mod._ENGINE_LAST_MATMUL_WRITE = last_write

    try:
        reset()
        exp = Experiment(load_config(SMOKE), phases=['train'], debug=True)
        assert exp.matmul_precision == 'highest'

        # an f32 Experiment's policy write does NOT leak into a later bf16
        # Experiment in the same process: XLA's default is restored
        exp = Experiment(load_config(SMOKE), phases=['train'], debug=True,
                         bf16=True)
        assert exp.matmul_precision is None
        assert jax.config.jax_default_matmul_precision is None

        reset()
        exp = Experiment(load_config(SMOKE), phases=['train'], debug=True,
                         bf16=True, matmul_precision='float32')
        assert exp.matmul_precision == 'float32'

        # user-set ambient (env var / jax.config call) is respected
        reset(ambient='tensorfloat32')
        exp = Experiment(load_config(SMOKE), phases=['train'], debug=True)
        assert exp.matmul_precision == 'tensorfloat32'

        # config-file knob beats user-set ambient
        reset(ambient='tensorfloat32')
        cfg = load_config(SMOKE)
        cfg.config.train['matmul_precision'] = 'high'
        exp = Experiment(cfg, phases=['train'], debug=True)
        assert exp.matmul_precision == 'high'

        # explicit arg beats the config-file knob
        reset()
        cfg = load_config(SMOKE)
        cfg.config.train['matmul_precision'] = 'high'
        exp = Experiment(cfg, phases=['train'], debug=True,
                         matmul_precision='float32')
        assert exp.matmul_precision == 'float32'

        # a user env/ambient setting survives an earlier Experiment's
        # EXPLICIT override: the next plain Experiment resolves back to
        # the user's value, not the leaked override or the policy default
        reset(ambient='high')
        exp = Experiment(load_config(SMOKE), phases=['train'], debug=True,
                         matmul_precision='float32')
        assert exp.matmul_precision == 'float32'
        exp = Experiment(load_config(SMOKE), phases=['train'], debug=True)
        assert exp.matmul_precision == 'high'

        # a user's EXPLICIT jax.config change made AFTER the first
        # Experiment is honored, not clobbered by the stale remembered
        # ambient: the engine re-captures whenever the live config differs
        # from what it last wrote
        reset()
        exp = Experiment(load_config(SMOKE), phases=['train'], debug=True)
        assert exp.matmul_precision == 'highest'
        jax.config.update('jax_default_matmul_precision', 'tensorfloat32')
        exp = Experiment(load_config(SMOKE), phases=['train'], debug=True)
        assert exp.matmul_precision == 'tensorfloat32'
        # ...and it persists as the new ambient for later Experiments too
        exp = Experiment(load_config(SMOKE), phases=['train'], debug=True,
                         bf16=True)
        assert exp.matmul_precision == 'tensorfloat32'
    finally:
        reset(ambient=prev, engine_set=prev_flag, user_ambient=prev_user,
              last_write=prev_write)


def test_eval_extended_coco_metrics():
    """``coco_metrics = {'extended': True}`` adds the full COCO scoreboard
    (area-banded AP, AR@k) to the eval result."""
    cfg = load_config(SMOKE)
    cfg.config.coco_metrics = {'extended': True}
    exp = Experiment(cfg, phases=['eval'], debug=True)
    metrics = exp.evaluate()
    for key in ('mAP', 'mAP@[.5:.95]', 'mAP-small', 'mAP-large',
                'AR@1', 'AR@100'):
        assert key in metrics, key
        assert 0.0 <= metrics[key] <= 1.0, (key, metrics[key])


def test_engine_zero_sharding_trains_and_resumes(tmp_path):
    """train.zero_sharding through the PRODUCT path: the engine shards the
    optimizer state over the data mesh, trains, checkpoints (gather) and
    resumes; losses match the replicated engine run."""
    results = []
    for zero in (False, True):
        cfg = load_config(SMOKE)
        cfg.config.train['epochs'] = 1
        cfg.config.train['eval_every'] = 99
        cfg.config.train['num_batches_per_epoch'] = 2
        cfg.config.train['zero_sharding'] = zero
        ckdir = str(tmp_path / f'zero_{zero}')
        os.makedirs(ckdir, exist_ok=True)
        exp = Experiment(cfg, phases=['train'], checkpoint_dir=ckdir,
                         debug=False)
        exp.save_every = 1
        if zero:
            import jax as _jax
            opt_shardings = _jax.tree_util.tree_leaves(
                exp._state_sharding.opt_state)
            assert any(not s.is_fully_replicated for s in opt_shardings)
            # momentum buffers actually live sharded on the mesh
            placed = _jax.tree_util.tree_leaves(exp.state.opt_state)
            assert any(not x.sharding.is_fully_replicated for x in placed
                       if hasattr(x, 'sharding'))
        rows = exp.train()
        results.append(rows[-1]['train_loss'])
        # resume restores into the sharded layout
        cfg2 = load_config(SMOKE)
        cfg2.config.train['epochs'] = 2
        cfg2.config.train['eval_every'] = 99
        cfg2.config.train['num_batches_per_epoch'] = 2
        cfg2.config.train['zero_sharding'] = zero
        exp2 = Experiment(cfg2, phases=['train'], resume_from=ckdir,
                          checkpoint_dir=ckdir, debug=False)
        assert exp2.start_epoch == 1
        rows2 = exp2.train()
        assert np.isfinite(rows2[-1]['train_loss'])
    np.testing.assert_allclose(results[0], results[1], rtol=2e-4)


def test_torch_weight_full_detector_import(tmp_path):
    """``model.detector.torch_weight`` loads a reference-format torch
    checkpoint (ckpt-N.pt) into the whole detector at Experiment build —
    the CLI/config face of utils.torch_import.import_reference_checkpoint."""
    from single_shot_detection_tpu.utils import torch_import

    cfg = load_config(SMOKE)
    exp = Experiment(cfg, phases=['eval'], debug=True)
    variables = {
        'params': jax.device_get(exp.state.params),
        'batch_stats': jax.device_get(exp.state.batch_stats),
    }
    # perturb a head kernel so the import is distinguishable from the
    # (same-seed) fresh init
    k = np.asarray(variables['params']['score_head0']['kernel'])
    variables['params']['score_head0']['kernel'] = k + 1.25

    pt = tmp_path / 'ckpt-3.pt'
    torch_import.export_reference_checkpoint(
        str(pt), variables, global_step=3,
        **torch_import.mapping_args_from_config(cfg.model))

    cfg2 = load_config(SMOKE)
    cfg2.config.model['detector']['torch_weight'] = str(pt)
    exp2 = Experiment(cfg2, phases=['eval'], debug=True)
    np.testing.assert_allclose(
        np.asarray(exp2.state.params['score_head0']['kernel']), k + 1.25,
        rtol=0, atol=0)
    # a backbone leaf came through too
    np.testing.assert_array_equal(
        np.asarray(exp2.state.params['features']['base']['stage3']
                   ['expand_conv']['kernel']),
        np.asarray(variables['params']['features']['base']['stage3']
                   ['expand_conv']['kernel']))


def test_transfer_ahead_equivalence(tmp_path):
    """Transfer-ahead double buffering (train.transfer_ahead) is a pure
    scheduling change: the background-thread device transfers must leave
    training params bitwise identical and eval metrics equal to the
    synchronous (depth 0) loop."""
    results = []
    for depth in (0, 2):
        cfg = load_config(SMOKE)
        cfg.config.train['epochs'] = 1
        cfg.config.train['eval_every'] = 1
        cfg.config.train['transfer_ahead'] = depth
        exp = Experiment(cfg, phases=['train', 'eval'], debug=True)
        assert exp.transfer_ahead == depth
        rows = exp.train()
        results.append((exp.state.params, rows[-1]))
    (params_a, row_a), (params_b, row_b) = results
    for x, y in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for k in ('train_loss', 'eval_loss', 'eval_mAP'):
        assert row_a[k] == row_b[k], (k, row_a[k], row_b[k])
