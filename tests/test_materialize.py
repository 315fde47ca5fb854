"""Physical pruning materialization: narrow model == masked model."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from single_shot_detection_tpu.models import builder
from single_shot_detection_tpu.train import create_train_state, pruning
from single_shot_detection_tpu.train.materialize import (build_channel_spaces,
                                                         materialize_bundle)


def flagship_like():
    return builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 3, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0, 2.0]] * 3},
        num_classes=5,
        use_depthwise=True,
        features={'name': 'Features', 'out_layers': (13, 18)},
        extras={'layers': (('s', 64),)},
        input_size=(96, 96))


def test_channel_spaces_cover_all_convs():
    bundle = flagship_like()
    variables = bundle.init(jax.random.PRNGKey(0))
    spaces = build_channel_spaces(variables['params'])
    covered = set()
    for s in spaces:
        for p in s.producers + s.depthwise + s.consumers:
            covered.add(p)
    kernels = {k[:-1] for k in pruning.conv_kernel_paths(variables['params'])}
    missing = kernels - covered
    assert not missing, f'conv modules not in any space: {missing}'
    # every non-head conv is a producer or depthwise member of some space
    producers = set()
    for s in spaces:
        producers.update(s.producers + s.depthwise)
    non_heads = {k for k in kernels if not k[0].startswith(('score_', 'loc_'))}
    assert not (non_heads - producers), non_heads - producers


def test_materialized_equals_masked():
    bundle = flagship_like()
    tx = pruning.masked(optax.sgd(1e-2))
    variables = bundle.init(jax.random.PRNGKey(0))
    state = create_train_state(variables, tx)

    pruner = pruning.Pruner(state.params, {'name': 'MinL1Norm'},
                            include_paths=['features', 'extra'], num=12)
    state = pruner.prune(state)
    assert pruner.dead

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 96, 3))
    masked_out = bundle.module.apply(
        {'params': state.params, 'batch_stats': state.batch_stats},
        x, train=False)

    new_bundle, new_vars = materialize_bundle(
        bundle, {'params': state.params, 'batch_stats': state.batch_stats},
        pruner.dead)
    narrow_out = new_bundle.module.apply(
        {'params': jax.tree_util.tree_map(jnp.asarray, new_vars['params']),
         'batch_stats': jax.tree_util.tree_map(jnp.asarray,
                                               new_vars['batch_stats'])},
        x, train=False)

    for a, b in zip(masked_out, narrow_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # the narrow model is actually smaller
    old_size = sum(np.size(v) for v in
                   jax.tree_util.tree_leaves(state.params))
    new_size = sum(np.size(v) for v in
                   jax.tree_util.tree_leaves(new_vars['params']))
    assert new_size < old_size
