"""jaxpr channel-dependency analyzer (train/deps.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from single_shot_detection_tpu.train import deps


class ConcatNet(nn.Module):
    """Two branches concatenated, then consumed — exercises per-segment
    consumer offsets."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = nn.Conv(4, (1, 1), name='conv_a', use_bias=True)(x)
        b = nn.Conv(6, (1, 1), name='conv_b', use_bias=False)(x)
        y = jnp.concatenate([a, b], axis=-1)
        return nn.Conv(3, (1, 1), name='conv_out', use_bias=False)(y)


def test_concat_consumer_offsets():
    m = ConcatNet()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 2)))
    spaces = deps.analyze_module(m, variables, (1, 8, 8, 2))

    def space_of(prod_name):
        for s in spaces:
            for mem in s.by_role('producer'):
                if mem.path[-2] == prod_name:
                    return s
        raise AssertionError(prod_name)

    sa = space_of('conv_a')
    sb = space_of('conv_b')
    assert sa.width == 4 and sb.width == 6
    # conv_out consumes segment a at offset 0 and segment b at offset 4
    cons_a = [m_ for m_ in sa.by_role('consumer')
              if m_.path[-2] == 'conv_out']
    cons_b = [m_ for m_ in sb.by_role('consumer')
              if m_.path[-2] == 'conv_out']
    assert cons_a and cons_a[0].axis == 2 and cons_a[0].offset == 0
    assert cons_b and cons_b[0].axis == 2 and cons_b[0].offset == 4
    # conv_a's bias is a discovered vector of space a
    vecs = {v.path[-1] for v in sa.by_role('vector')}
    assert 'bias' in vecs


class ResidualNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(8, (1, 1), name='conv1', use_bias=False)(x)
        h = h + nn.Conv(8, (1, 1), name='conv2', use_bias=False)(x)
        return nn.Conv(2, (1, 1), name='head', use_bias=False)(h)


def test_residual_union_and_output_freeze():
    m = ResidualNet()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 3)))
    spaces = deps.analyze_module(m, variables, (1, 4, 4, 3))
    joined = [s for s in spaces if len(s.by_role('producer')) == 2]
    assert len(joined) == 1 and joined[0].width == 8
    assert not joined[0].frozen
    # the head's own out space reaches the model output -> frozen
    head = [s for s in spaces
            if any(m_.path[-2] == 'head' for m_ in s.by_role('producer'))]
    assert head and head[0].frozen


class ReshapeEscape(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(6, (1, 1), name='conv', use_bias=False)(x)
        return h.reshape(h.shape[0], -1)  # splits the channel axis


def test_channel_splitting_reshape_freezes():
    m = ReshapeEscape()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 3)))
    spaces = deps.analyze_module(m, variables, (1, 4, 4, 3))
    (s,) = [s for s in spaces
            if any(m_.path[-2] == 'conv' for m_ in s.by_role('producer'))]
    assert s.frozen


def test_depthwise_flows_space_through():
    class DW(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            h = nn.Conv(8, (1, 1), name='pw', use_bias=False)(x)
            h = nn.Conv(8, (3, 3), feature_group_count=8, name='dw',
                        use_bias=False, padding='SAME')(h)
            return nn.Conv(2, (1, 1), name='head', use_bias=False)(h)

    m = DW()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    spaces = deps.analyze_module(m, variables, (1, 8, 8, 3))
    (s,) = [s for s in spaces
            if any(m_.path[-2] == 'pw' for m_ in s.by_role('producer'))]
    dw = [m_ for m_ in s.by_role('depthwise')]
    assert dw and dw[0].path[-2] == 'dw' and dw[0].axis == 3
    cons = [m_ for m_ in s.by_role('consumer')]
    assert any(m_.path[-2] == 'head' for m_ in cons)


def test_materialize_slices_concat_consumer():
    """Pruning a channel of branch b must slice conv_out's in-axis at the
    shifted offset and keep outputs identical."""
    import optax
    from single_shot_detection_tpu.train import pruning
    from single_shot_detection_tpu.train.materialize import materialize

    m = ConcatNet()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 2)))
    spaces = deps.analyze_module(m, variables, (1, 8, 8, 2))

    dead = {('conv_b', 'kernel'): {1, 3}, ('conv_a', 'kernel'): {2}}
    # zero those channels first (masked model)
    params = jax.tree_util.tree_map(lambda v: np.array(v, copy=True),
                                    variables['params'])
    for (name, _), chans in dead.items():
        k = params[name]['kernel']
        for c in chans:
            k[..., c] = 0.0
        if 'bias' in params[name]:
            for c in chans:
                params[name]['bias'][c] = 0.0
    masked_vars = {'params': jax.tree_util.tree_map(jnp.asarray, params)}

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 2))
    masked_out = m.apply(masked_vars, x)

    new_vars, widths = materialize(masked_vars, dead, spaces)
    assert widths[('conv_a',)] == 3 and widths[('conv_b',)] == 4
    assert new_vars['params']['conv_out']['kernel'].shape[2] == 7

    class Narrow(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            a = nn.Conv(3, (1, 1), name='conv_a', use_bias=True)(x)
            b = nn.Conv(4, (1, 1), name='conv_b', use_bias=False)(x)
            y = jnp.concatenate([a, b], axis=-1)
            return nn.Conv(3, (1, 1), name='conv_out', use_bias=False)(y)

    narrow_out = Narrow().apply(
        {'params': jax.tree_util.tree_map(jnp.asarray, new_vars['params'])}, x)
    np.testing.assert_allclose(np.asarray(masked_out), np.asarray(narrow_out),
                               rtol=1e-5, atol=1e-5)


def test_analyzer_safe_on_depthwise_fpn_zoo():
    """Unsupported corners (channel splits, unknown mixes) must freeze, not
    crash or mis-cover: every conv kernel is a writer of SOME space."""
    from single_shot_detection_tpu.models import builder
    from single_shot_detection_tpu.train.pruning import conv_kernel_paths
    b = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 3, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0, 2.0]] * 3},
        num_classes=5, use_depthwise=True,
        features={'name': 'DepthwiseFeaturePyramid', 'out_layers': (13, 18),
                  'pyramid_layers': 3, 'pyramid_channels': 32},
        extras=None, input_size=(64, 64))
    variables = b.init(jax.random.PRNGKey(0))
    spaces = deps.analyze_module(b.module, variables, (1, 64, 64, 3))
    kernels = {('params',) + k
               for k in conv_kernel_paths(variables['params'])}
    writers = {m.path for s in spaces for m in s.members
               if m.role in ('producer', 'depthwise')}
    assert not (kernels - writers), kernels - writers


def test_clamp_preserves_channel_annotation():
    """lax.clamp's VALUE operand is ins[1] — mishandling it as unary read
    the min bound and dropped the annotation (regression)."""
    class ClampNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            h = nn.Conv(6, (1, 1), name='conv', use_bias=False)(x)
            h = jnp.clip(h, 0.0, 6.0)  # relu6 via clamp
            return nn.Conv(2, (1, 1), name='head', use_bias=False)(h)

    m = ClampNet()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 3)))
    spaces = deps.analyze_module(m, variables, (1, 4, 4, 3))
    (s,) = [s for s in spaces
            if any(m_.path[-2] == 'conv' for m_ in s.by_role('producer'))]
    # the head must be registered as consumer through the clamp
    assert any(m_.path[-2] == 'head' for m_ in s.by_role('consumer'))


def _writer_cover_and_spaces(module, variables, in_shape):
    from single_shot_detection_tpu.train.pruning import conv_kernel_paths
    spaces = deps.analyze_module(module, variables, in_shape)
    kernels = {('params',) + k
               for k in conv_kernel_paths(variables['params'])}
    writers = {m_.path for s in spaces for m_ in s.members
               if m_.role in ('producer', 'depthwise')}
    assert not (kernels - writers), kernels - writers
    return spaces


def test_shufflenet_channel_shuffle_freezes_not_corrupts():
    """ShuffleNetV2's channel shuffle (reshape/transpose of the channel axis,
    models/shufflenet_v2.py:26-30) is an unprovable topology for channel
    pruning: the analyzer must FREEZE the spaces that flow into it — never
    emit prunable spaces with silently wrong members (the module's safety
    contract, deps.py docstring)."""
    from single_shot_detection_tpu.models.shufflenet_v2 import (
        SHUFFLENET_WIDTHS, ShuffleNetV2)

    m = ShuffleNetV2(channels=SHUFFLENET_WIDTHS[0.5])
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    spaces = _writer_cover_and_spaces(m, variables, (1, 64, 64, 3))

    # the branch OUTPUT convs (branch1_pw / branch2_pw2) feed the concat
    # that is immediately channel-shuffled: those spaces must be frozen.
    # (branch2_pw1 is internal to the branch — consumed by the depthwise
    # before the shuffle — and may stay prunable.)
    checked = 0
    for s in spaces:
        for mem in s.by_role('producer'):
            leafmod = str(mem.path[-2])
            if leafmod in ('branch1_pw', 'branch2_pw2'):
                checked += 1
                assert s.frozen, (mem.path, 'shuffle-fed space not frozen')
    assert checked >= 10, checked  # every stage unit has these convs


def test_m2det_tum_concat_chain_analysis():
    """An M2Det MLFPN slice (2 TUMs, 3 scales): the analyzer must cover every
    conv as a writer and keep per-scale concat consumer offsets consistent
    (TUM outputs concatenate across TUMs before SFAM, features.py:303)."""
    from single_shot_detection_tpu.models import builder

    b = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 3, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]] * 3},
        num_classes=5,
        features={'name': 'MultilevelFeaturePyramid',
                  'out_layers': (13, 18), 'num_scales': 3, 'num_tums': 2,
                  'base_reduced_channels': [64, 32], 'reduced_channels': 32,
                  'tum': {'inner_channels': 32, 'out_channels': 16}},
        extras=None, input_size=(64, 64))
    variables = b.init(jax.random.PRNGKey(0))
    spaces = _writer_cover_and_spaces(b.module, variables, (1, 64, 64, 3))

    # TUM smooth outputs of tum0/tum1 join per-scale concats consumed by the
    # SFAM gates / heads: the SECOND tum's segment must either carry a
    # nonzero consumer offset (concat-offset bookkeeping, deps.py) or be
    # frozen (if an unprovable op intervenes) — never a zero-offset prunable
    # alias of the first tum's segment
    tum1_spaces = []
    for s in spaces:
        for m_ in s.by_role('producer'):
            joined = '/'.join(str(p) for p in m_.path)
            if '/tum1/' in joined and '/smooth' in joined:
                tum1_spaces.append(s)
                break
    assert tum1_spaces, 'tum1 smooth convs produced no tracked spaces'
    for s in tum1_spaces:
        cons = s.by_role('consumer')
        assert s.frozen or any(m_.offset > 0 for m_ in cons), (
            s.frozen, [(m_.path, m_.offset) for m_ in cons])


def test_scan_like_subjaxpr_freezes_instead_of_inlining():
    """ADVICE r2 (medium): a primitive with one sub-jaxpr and matching invar
    COUNT but rank-reduced invar SHAPES (lax.scan's xs) must not be inlined
    with verbatim annotations — it must degrade to frozen/not-pruned."""
    class ScanNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            h = nn.Conv(6, (1, 1), name='conv', use_bias=False)(x)

            def body(c, s):
                return c * s, ()

            h, _ = jax.lax.scan(body, h, jnp.ones((3,)))
            return nn.Conv(2, (1, 1), name='head', use_bias=False)(h)

    m = ScanNet()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 3)))
    spaces = _writer_cover_and_spaces(m, variables, (1, 4, 4, 3))
    (s,) = [s for s in spaces
            if any(m_.path[-2] == 'conv' for m_ in s.by_role('producer'))]
    assert s.frozen, 'scan body must freeze the space, not inline it'
