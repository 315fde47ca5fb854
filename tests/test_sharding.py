"""Multi-device data parallelism on the virtual 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from single_shot_detection_tpu.models import builder
from single_shot_detection_tpu.ops import losses, matching, sampling
from single_shot_detection_tpu.ops.box_coder import BoxCoder
from single_shot_detection_tpu.parallel import (batch_sharding, create_mesh,
                                                replicated, shard_batch)
from single_shot_detection_tpu.train import (create_train_state,
                                             make_train_step, optimizers)


IMG = 64
NUM_CLASSES = 3


def test_mesh_has_8_devices():
    assert jax.device_count() == 8
    mesh = create_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ('data', 'model')


def test_data_parallel_train_step_matches_single_device(rng):
    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 1, 'min_scale': 0.3,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]]},
        num_classes=NUM_CLASSES,
        features={'name': 'Features', 'out_layers': (18,)},
        input_size=(IMG, IMG))
    anchors = bundle.anchors()
    coder = BoxCoder(10.0, 5.0)
    # naive sampler: hard-negative mining ranks by logits, and ~1e-7
    # BN-stat reduction-order noise between sharded and single-device
    # layouts flips rank TIES into different sampled negatives — a
    # structural (if harmless) divergence that forces a sloppy tolerance;
    # with a tie-free sampler agreement is tight
    criterion = losses.MultiboxLoss(sampling.naive_sampler, coder,
                                    {'name': 'CrossEntropyLoss'},
                                    {'name': 'SmoothL1Loss'})
    assigner = matching.TargetAssigner(0.5)
    tx = optimizers.create_optimizer({'name': 'SGD', 'lr': 1e-2})
    variables = bundle.init(jax.random.PRNGKey(0), batch_size=8)
    state = create_train_state(variables, tx)

    batch_np = {
        'image': rng.rand(8, IMG, IMG, 3).astype(np.float32),
        'boxes': np.tile(np.array([10, 10, 40, 40, 1, 1], np.float32),
                         (8, 2, 1)),
        'box_mask': np.ones((8, 2), bool),
    }

    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=False)

    # single-device run
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, metrics1 = step(state, batch1, jax.random.PRNGKey(1))

    # 8-way data-parallel run: batch sharded, state replicated
    mesh = create_mesh()
    rep = replicated(mesh)
    state_sh = jax.device_put(state, rep)
    batch8 = shard_batch(mesh, batch_np)
    assert batch8['image'].sharding.spec[0] == 'data'
    state8, metrics8 = step(state_sh, batch8, jax.random.PRNGKey(1))

    # semantic agreement is pinned tightly by the loss and the BN batch
    # statistics (both are direct reductions over the global batch) ...
    np.testing.assert_allclose(float(metrics8['loss']),
                               float(metrics1['loss']), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state1.batch_stats),
                    jax.tree_util.tree_leaves(state8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # ... while post-step PARAMS only agree loosely: the backward pass
    # through 19 BatchNorm layers amplifies ~1e-6 scheduling/reduction
    # noise between the sharded and single-device layouts into O(0.1)
    # early-backbone gradient differences (measured; loss & stats above
    # agree to 1e-5-1e-6 at the same time), so lr * grad gives ~1e-2
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


def test_hard_negative_mining_sharded_matches_exactly(rng):
    """The production sampler under the data mesh, on IDENTICAL logits:
    per-image top-k negative selection must be bitwise identical to the
    single-device result (catches e.g. a per-shard-instead-of-per-image
    top-k partitioning regression).  The train-step agreement test above
    deliberately uses the tie-free naive sampler — BN reduction-order
    noise between layouts flips rank ties — so this pins the
    hard-negative-mining path where its inputs are exactly equal."""
    B, A, C = 8, 64, NUM_CLASSES
    scores = jnp.asarray(rng.randn(B, A, C).astype(np.float32))
    targets = jnp.asarray(rng.randint(-1, C, size=(B, A)).astype(np.int32))
    sample = jax.jit(functools.partial(
        sampling.hard_negative_mining,
        negative_per_positive_ratio=3, min_negative_per_image=5))

    single = np.asarray(sample(scores, targets))

    mesh = create_mesh()
    sh = NamedSharding(mesh, P('data'))
    sharded = np.asarray(sample(jax.device_put(scores, sh),
                                jax.device_put(targets, sh)))
    np.testing.assert_array_equal(single, sharded)


def test_shard_batch_spatial_places_image_heights():
    """spatial=True: image leaves shard H over 'model' (plain and fused
    [k, B, ...] layouts); box/mask leaves stay data-sharded only."""
    mesh = create_mesh(n_data=4, n_model=2)
    batch = {'image': np.zeros((8, 4, 4, 3), np.float32),
             'boxes': np.zeros((8, 2, 6), np.float32),
             'box_mask': np.zeros((8, 2), bool)}
    sharded = shard_batch(mesh, batch, spatial=True)
    assert tuple(sharded['image'].sharding.spec[:2]) == ('data', 'model')
    assert 'model' not in tuple(sharded['boxes'].sharding.spec)
    assert 'model' not in tuple(sharded['box_mask'].sharding.spec)

    fused = {k: np.stack([v, v]) for k, v in batch.items()}
    sharded = shard_batch(mesh, fused, axis=1, spatial=True)
    assert tuple(sharded['image'].sharding.spec[:3]) == (None, 'data',
                                                         'model')
    assert 'model' not in tuple(sharded['boxes'].sharding.spec)


def test_shard_batch_places_on_data_axis():
    mesh = create_mesh()
    batch = {'image': np.zeros((8, 4, 4, 3), np.float32),
             'boxes': np.zeros((8, 2, 6), np.float32),
             'box_mask': np.zeros((8, 2), bool)}
    sharded = shard_batch(mesh, batch)
    for v in sharded.values():
        assert v.sharding.spec[0] == 'data'
    assert batch_sharding(mesh).spec == P('data')


def test_data_parallel_eval_step(rng):
    """eval step (forward + postprocess incl. NMS) under the data mesh."""
    from single_shot_detection_tpu.ops.postprocess import Postprocessor
    from single_shot_detection_tpu.train import make_eval_step

    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 1, 'min_scale': 0.3,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]]},
        num_classes=NUM_CLASSES,
        features={'name': 'Features', 'out_layers': (18,)},
        input_size=(IMG, IMG))
    anchors = bundle.anchors()
    coder = BoxCoder(10.0, 5.0)
    sampler = functools.partial(sampling.hard_negative_mining,
                                negative_per_positive_ratio=3,
                                min_negative_per_image=2)
    criterion = losses.MultiboxLoss(sampler, coder,
                                    {'name': 'CrossEntropyLoss'},
                                    {'name': 'SmoothL1Loss'})
    assigner = matching.TargetAssigner(0.5)
    pp = Postprocessor(coder, score_threshold=0.01, max_total=10,
                       nms={'max_per_class': 5, 'overlap_threshold': 0.45},
                       use_pallas=False)
    tx = optimizers.create_optimizer({'name': 'SGD', 'lr': 1e-2})
    state = create_train_state(bundle.init(jax.random.PRNGKey(0)), tx)
    eval_step = make_eval_step(bundle.module, criterion, assigner, anchors, pp)

    batch_np = {
        'image': rng.rand(8, IMG, IMG, 3).astype(np.float32),
        'boxes': np.tile(np.array([10, 10, 40, 40, 1, 1], np.float32),
                         (8, 2, 1)),
        'box_mask': np.ones((8, 2), bool),
    }
    mesh = create_mesh()
    state_sh = jax.device_put(state, replicated(mesh))
    batch8 = shard_batch(mesh, batch_np)
    metrics, dets, valid = eval_step(state_sh, batch8)
    assert np.isfinite(float(metrics['loss']))
    assert dets.shape == (8, 10, 6)

    # single-device agreement
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    m1, d1, v1 = eval_step(state, batch1)
    np.testing.assert_allclose(float(metrics['loss']), float(m1['loss']),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dets), np.asarray(d1), atol=1e-3)


def test_spatial_partitioning_forward_agrees(rng):
    """Very-large-input extension (SURVEY §5): shard the image H axis over
    the mesh's 'model' axis — GSPMD inserts the conv halo exchanges — and
    the forward pass matches the unsharded one."""
    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 1, 'min_scale': 0.3,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]]},
        num_classes=NUM_CLASSES,
        features={'name': 'Features', 'out_layers': (18,)},
        input_size=(IMG, IMG))
    variables = bundle.init(jax.random.PRNGKey(0), batch_size=2)
    x = jnp.asarray(rng.rand(2, IMG, IMG, 3).astype(np.float32))

    ref_scores, ref_locs = jax.jit(
        lambda v, xx: bundle.module.apply(v, xx, train=False))(variables, x)

    mesh = create_mesh(n_data=2, n_model=4)
    x_sharding = NamedSharding(mesh, P('data', 'model', None, None))
    rep = replicated(mesh)
    fn = jax.jit(lambda v, xx: bundle.module.apply(v, xx, train=False),
                 in_shardings=(rep, x_sharding))
    scores, locs = fn(variables, jax.device_put(x, x_sharding))

    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(locs), np.asarray(ref_locs),
                               rtol=2e-4, atol=2e-4)


def test_hybrid_spatial_train_step_agrees(rng):
    """Hybrid (data x spatial) sharding — the dryrun_multichip layout: the
    full train step on a (4, 2) mesh with the image H axis sharded over
    'model' matches the single-device step (GSPMD conv halos + cross-axis
    loss/grad/BN reductions)."""
    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 1, 'min_scale': 0.3,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]]},
        num_classes=NUM_CLASSES,
        features={'name': 'Features', 'out_layers': (18,)},
        input_size=(IMG, IMG))
    anchors = bundle.anchors()
    coder = BoxCoder(10.0, 5.0)
    criterion = losses.MultiboxLoss(sampling.naive_sampler, coder,
                                    {'name': 'CrossEntropyLoss'},
                                    {'name': 'SmoothL1Loss'})
    assigner = matching.TargetAssigner(0.5)
    tx = optimizers.create_optimizer({'name': 'SGD', 'lr': 1e-2})
    state = create_train_state(bundle.init(jax.random.PRNGKey(0),
                                           batch_size=8), tx)

    batch_np = {
        'image': rng.rand(8, IMG, IMG, 3).astype(np.float32),
        'boxes': np.tile(np.array([10, 10, 40, 40, 1, 1], np.float32),
                         (8, 2, 1)),
        'box_mask': np.ones((8, 2), bool),
    }
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=False)

    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, metrics1 = step(state, batch1, jax.random.PRNGKey(1))

    mesh = create_mesh(n_data=4, n_model=2)
    state_sh = jax.device_put(state, replicated(mesh))
    batch_sh = {
        'image': jax.device_put(
            batch_np['image'],
            NamedSharding(mesh, P('data', 'model', None, None))),
        'boxes': jax.device_put(batch_np['boxes'],
                                NamedSharding(mesh, P('data'))),
        'box_mask': jax.device_put(batch_np['box_mask'],
                                   NamedSharding(mesh, P('data'))),
    }
    state_h, metrics_h = step(state_sh, batch_sh, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(metrics_h['loss']),
                               float(metrics1['loss']), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state1.batch_stats),
                    jax.tree_util.tree_leaves(state_h.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # params: same loose tolerance rationale as the data-parallel test
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state_h.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


def test_qat_ema_train_step_on_mesh_agrees(rng):
    """QAT act_amax stats + EMA shadow params through the 8-device mesh:
    the new state fields replicate/update identically to single-device
    (act_amax is a global-batch max -> exact; EMA follows params)."""
    from single_shot_detection_tpu.export import quantize

    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 1, 'min_scale': 0.3,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]]},
        num_classes=NUM_CLASSES,
        features={'name': 'Features', 'out_layers': (18,)},
        input_size=(IMG, IMG))
    anchors = bundle.anchors()
    coder = BoxCoder(10.0, 5.0)
    criterion = losses.MultiboxLoss(sampling.naive_sampler, coder,
                                    {'name': 'CrossEntropyLoss'},
                                    {'name': 'SmoothL1Loss'})
    assigner = matching.TargetAssigner(0.5)
    tx = optimizers.create_optimizer({'name': 'SGD', 'lr': 1e-2})
    variables = quantize.qat_init(bundle.module, bundle.init,
                                  jax.random.PRNGKey(0), batch_size=8)
    state = create_train_state(variables, tx, ema=True)
    apply_fn = quantize.qat_apply(bundle.module)
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=False, ema=0.9,
                           apply_fn=apply_fn, qat=True)

    batch_np = {
        'image': rng.rand(8, IMG, IMG, 3).astype(np.float32),
        'boxes': np.tile(np.array([10, 10, 40, 40, 1, 1], np.float32),
                         (8, 2, 1)),
        'box_mask': np.ones((8, 2), bool),
    }
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, metrics1 = step(state, batch1, jax.random.PRNGKey(1))

    mesh = create_mesh()
    state_sh = jax.device_put(state, replicated(mesh))
    batch8 = shard_batch(mesh, batch_np)
    state8, metrics8 = step(state_sh, batch8, jax.random.PRNGKey(1))

    # fake-quant agreement is inherently loose: round(x/scale) is
    # discontinuous, so the ~1e-6 reduction-order noise between layouts
    # (see the DP test above) flips quantization bins on later-layer
    # activations and amplifies to ~1% of loss — the test pins the
    # PLUMBING (state fields flow through the mesh), not bit equality
    np.testing.assert_allclose(float(metrics8['loss']),
                               float(metrics1['loss']), rtol=5e-2)
    # act_amax: max over the global batch — exact where the conv input is
    # identical (the first conv sees the raw images); downstream of bin
    # flips a MAX statistic keys on single outliers, so deep layers of a
    # random-init net legitimately drift by tens of percent after one step
    a1 = quantize.amax_from_batch_stats(state1.batch_stats)
    a8 = quantize.amax_from_batch_stats(state8.batch_stats)
    assert a1 and set(a1) == set(a8)
    first = 'features/base/stage0/conv'  # the stem: sees the raw images
    np.testing.assert_allclose(a1[first], a8[first], rtol=1e-5,
                               err_msg=first)
    for k in a1:
        assert np.isfinite(a1[k]) and a1[k] > 0, k
        np.testing.assert_allclose(a1[k], a8[k], rtol=0.5, err_msg=k)
    # EMA shadow: cross-layout param agreement is meaningless under
    # fake-quant (bin flips amplify gradient noise), so pin the EMA
    # RECURRENCE within the sharded run instead: after one step with the
    # warmup ramp, shadow == init + (1-d)*(params - init), d = min(.9, 2/11)
    d = min(0.9, 2.0 / 11.0)
    for e, p0, p1 in zip(jax.tree_util.tree_leaves(state8.ema_params),
                         jax.tree_util.tree_leaves(state.params),
                         jax.tree_util.tree_leaves(state8.params)):
        want = np.asarray(p0) + (1.0 - d) * (np.asarray(p1) - np.asarray(p0))
        np.testing.assert_allclose(np.asarray(e), want, atol=1e-5)


def test_zero_sharding_train_step(rng):
    """ZeRO-1 optimizer-state sharding (parallel.zero_state_sharding +
    train.zero_sharding): Adam moments + EMA shadow sharded over the data
    axis, params replicated; a donated step keeps the layout stable and
    agrees with the fully-replicated run."""
    from single_shot_detection_tpu.parallel import zero_state_sharding

    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 1, 'min_scale': 0.3,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]]},
        num_classes=NUM_CLASSES,
        features={'name': 'Features', 'out_layers': (18,)},
        input_size=(IMG, IMG))
    anchors = bundle.anchors()
    coder = BoxCoder(10.0, 5.0)
    criterion = losses.MultiboxLoss(sampling.naive_sampler, coder,
                                    {'name': 'CrossEntropyLoss'},
                                    {'name': 'SmoothL1Loss'})
    assigner = matching.TargetAssigner(0.5)
    tx = optimizers.create_optimizer({'name': 'Adam', 'lr': 1e-3})
    variables = bundle.init(jax.random.PRNGKey(0), batch_size=8)
    state = create_train_state(variables, tx, ema=True)

    mesh = create_mesh()
    zero = zero_state_sharding(mesh, state)

    # placement contract: params/batch_stats replicated; large Adam-moment
    # and EMA leaves sharded on a divisible axis; scalars replicated
    for s in jax.tree_util.tree_leaves(
            (zero.params, zero.batch_stats, zero.step, zero.lr_scale)):
        assert s.is_fully_replicated
    opt_shardings = jax.tree_util.tree_leaves(zero.opt_state)
    assert any(not s.is_fully_replicated for s in opt_shardings)
    assert any(not s.is_fully_replicated
               for s in jax.tree_util.tree_leaves(zero.ema_params))
    for leaf, s in zip(jax.tree_util.tree_leaves(state.opt_state),
                       opt_shardings):
        if not s.is_fully_replicated:
            ax = s.spec.index('data')
            assert np.shape(leaf)[ax] % 8 == 0

    batch_np = {
        'image': rng.rand(8, IMG, IMG, 3).astype(np.float32),
        'boxes': np.tile(np.array([10, 10, 40, 40, 1, 1], np.float32),
                         (8, 2, 1)),
        'box_mask': np.ones((8, 2), bool),
    }

    # replicated (oracle) run
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=False, ema=0.9)
    state_rep = jax.device_put(state, replicated(mesh))
    batch8 = shard_batch(mesh, batch_np)
    state1, metrics1 = step(state_rep, batch8, jax.random.PRNGKey(1))

    # ZeRO run: donated, output pinned to the zero layout
    zstep = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                            donate=True, ema=0.9, state_sharding=zero)
    state_z = jax.device_put(state, zero)
    state_z, metrics_z = zstep(state_z, batch8, jax.random.PRNGKey(1))
    # donation invalidates state_z's buffers on the next call — keep host
    # copies of the step-1 result for the numerical comparison below
    params_z = jax.device_get(state_z.params)
    ema_z = jax.device_get(state_z.ema_params)

    # layout stability across donated steps (no GSPMD re-decision)
    for out, want in zip(jax.tree_util.tree_leaves(state_z.opt_state),
                         opt_shardings):
        assert out.sharding.is_equivalent_to(want, out.ndim)
    state_z2, _ = zstep(state_z, batch8, jax.random.PRNGKey(2))
    for out, want in zip(jax.tree_util.tree_leaves(state_z2.opt_state),
                         opt_shardings):
        assert out.sharding.is_equivalent_to(want, out.ndim)

    # numerical agreement with the replicated layout (same batch layout on
    # both sides, so only the opt-state slicing differs — tight)
    np.testing.assert_allclose(float(metrics_z['loss']),
                               float(metrics1['loss']), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(params_z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state1.ema_params),
                    jax.tree_util.tree_leaves(ema_z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _tiny_bundle():
    return builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 1, 'min_scale': 0.3,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]]},
        num_classes=NUM_CLASSES,
        features={'name': 'Features', 'out_layers': (18,)},
        input_size=(IMG, IMG))


def test_tensor_parallel_train_step_agrees(rng):
    """Tensor (channel) parallelism (parallel.tensor_state_sharding +
    train.tensor_sharding): conv cout / BN params sharded over the model
    axis on a (2, 4) mesh — the donated step keeps the layout and agrees
    with the single-device run."""
    from single_shot_detection_tpu.parallel import tensor_state_sharding

    bundle = _tiny_bundle()
    anchors = bundle.anchors()
    coder = BoxCoder(10.0, 5.0)
    criterion = losses.MultiboxLoss(sampling.naive_sampler, coder,
                                    {'name': 'CrossEntropyLoss'},
                                    {'name': 'SmoothL1Loss'})
    assigner = matching.TargetAssigner(0.5)
    tx = optimizers.create_optimizer({'name': 'Adam', 'lr': 1e-3})
    state = create_train_state(bundle.init(jax.random.PRNGKey(0),
                                           batch_size=8), tx)
    batch_np = {
        'image': rng.rand(8, IMG, IMG, 3).astype(np.float32),
        'boxes': np.tile(np.array([10, 10, 40, 40, 1, 1], np.float32),
                         (8, 2, 1)),
        'box_mask': np.ones((8, 2), bool),
    }

    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           donate=False)
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, metrics1 = step(state, batch1, jax.random.PRNGKey(1))

    mesh = create_mesh(n_data=2, n_model=4)
    tp = tensor_state_sharding(mesh, state)
    # placement contract: channel-divisible param/stat leaves shard their
    # LAST axis over 'model'; scalars and non-divisible heads replicate
    tp_params = jax.tree_util.tree_leaves(tp.params)
    assert any(not s.is_fully_replicated for s in tp_params)
    for leaf, s in zip(jax.tree_util.tree_leaves(state.params), tp_params):
        if not s.is_fully_replicated:
            assert s.spec[np.ndim(leaf) - 1] == 'model'
            assert np.shape(leaf)[-1] % 4 == 0
    assert any(not s.is_fully_replicated
               for s in jax.tree_util.tree_leaves(tp.batch_stats))

    tstep = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                            donate=True, state_sharding=tp)
    state_tp = jax.device_put(state, tp)
    batch8 = shard_batch(mesh, batch_np)
    state_tp, metrics_tp = tstep(state_tp, batch8, jax.random.PRNGKey(1))
    params_tp = jax.device_get(state_tp.params)
    stats_tp = jax.device_get(state_tp.batch_stats)

    # layout stability under donation (no GSPMD re-decision on step 2)
    for out, want in zip(jax.tree_util.tree_leaves(state_tp.params),
                         tp_params):
        assert out.sharding.is_equivalent_to(want, out.ndim)
    state_tp2, _ = tstep(state_tp, batch8, jax.random.PRNGKey(2))
    for out, want in zip(jax.tree_util.tree_leaves(state_tp2.params),
                         tp_params):
        assert out.sharding.is_equivalent_to(want, out.ndim)

    np.testing.assert_allclose(float(metrics_tp['loss']),
                               float(metrics1['loss']), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(state1.batch_stats),
                    jax.tree_util.tree_leaves(stats_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # params: same loose tolerance rationale as the data-parallel test
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(params_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


def test_tensor_parallel_zero_composition(rng):
    """tensor_state_sharding(zero=True): params shard 'model' on the last
    axis; optimizer moments additionally shard a remaining axis over
    'data' — the combined train.tensor_sharding + train.zero_sharding
    layout."""
    from single_shot_detection_tpu.parallel import tensor_state_sharding

    bundle = _tiny_bundle()
    tx = optimizers.create_optimizer({'name': 'Adam', 'lr': 1e-3})
    state = create_train_state(bundle.init(jax.random.PRNGKey(0)), tx,
                               ema=True)
    mesh = create_mesh(n_data=2, n_model=4)
    tp = tensor_state_sharding(mesh, state, zero=True)

    for s in jax.tree_util.tree_leaves((tp.step, tp.lr_scale)):
        assert s.is_fully_replicated
    # at least one moment leaf carries BOTH axes
    both = 0
    for leaf, s in zip(jax.tree_util.tree_leaves(state.opt_state),
                       jax.tree_util.tree_leaves(tp.opt_state)):
        if s.is_fully_replicated:
            continue
        spec = tuple(s.spec) + (None,) * (np.ndim(leaf) - len(s.spec))
        if 'model' in spec:
            assert spec[np.ndim(leaf) - 1] == 'model'
            assert np.shape(leaf)[-1] % 4 == 0
        if 'data' in spec:
            ax = spec.index('data')
            assert np.shape(leaf)[ax] % 2 == 0
            assert ax != np.ndim(leaf) - 1 or spec[ax] != 'model'
        both += int('model' in spec and 'data' in spec)
    assert both > 0, 'no moment leaf sharded over both axes'
    assert any(not s.is_fully_replicated
               for s in jax.tree_util.tree_leaves(tp.ema_params))


def test_zero_sharding_checkpoint_roundtrip(tmp_path, rng):
    """A ZeRO-sharded state saves (gather) and restores into a fresh
    template bit-exactly."""
    from single_shot_detection_tpu.parallel import zero_state_sharding
    from single_shot_detection_tpu.train import checkpoint as ckpt

    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 1, 'min_scale': 0.3,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]]},
        num_classes=NUM_CLASSES,
        features={'name': 'Features', 'out_layers': (18,)},
        input_size=(IMG, IMG))
    tx = optimizers.create_optimizer({'name': 'Adam', 'lr': 1e-3})
    variables = bundle.init(jax.random.PRNGKey(0), batch_size=2)
    state = create_train_state(variables, tx)
    mesh = create_mesh()
    state_z = jax.device_put(state, zero_state_sharding(mesh, state))

    path = ckpt.save(str(tmp_path), state_z, epoch=3)
    template = create_train_state(
        bundle.init(jax.random.PRNGKey(9), batch_size=2), tx)
    restored, meta = ckpt.restore(path, template)
    assert meta['epoch'] == 3
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
