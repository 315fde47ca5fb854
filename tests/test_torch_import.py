import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from single_shot_detection_tpu.models import builder
from single_shot_detection_tpu.utils import torch_import


def synthetic_mbv2_state_dict(variables, rng):
    """Build a torchvision-style state_dict whose shapes reverse-map onto
    our flax MobileNetV2 params."""
    mapping = torch_import.mobilenet_v2_mapping()
    params = variables['params']['features']['base']
    stats = variables['batch_stats']['features']['base']
    sd = {}
    for torch_prefix, path in mapping.items():
        node_p = params
        node_s = stats
        for k in path[:-1]:
            node_p = node_p[k]
            node_s = node_s.get(k, {})
        leaf = path[-1]
        p = node_p[leaf]
        if 'scale' in p:  # BN
            c = p['scale'].shape[0]
            sd[f'{torch_prefix}.weight'] = torch.from_numpy(
                rng.randn(c).astype(np.float32))
            sd[f'{torch_prefix}.bias'] = torch.from_numpy(
                rng.randn(c).astype(np.float32))
            sd[f'{torch_prefix}.running_mean'] = torch.from_numpy(
                rng.randn(c).astype(np.float32))
            sd[f'{torch_prefix}.running_var'] = torch.from_numpy(
                np.abs(rng.randn(c)).astype(np.float32) + 0.5)
        else:  # conv kernel [kh, kw, in, out] -> torch [out, in, kh, kw]
            kh, kw, cin, cout = p['kernel'].shape
            sd[f'{torch_prefix}.weight'] = torch.from_numpy(
                rng.randn(cout, cin, kh, kw).astype(np.float32))
    return sd


def test_mbv2_import_shapes_and_roundtrip(rng):
    bundle = builder.build(
        base={'name': 'torchvision_mobilenet_v2'},
        anchor_generator={'type': 'ssd', 'num_scales': 2, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]] * 2},
        num_classes=4,
        features={'name': 'Features', 'out_layers': (13, 18)},
        input_size=(96, 96))
    variables = bundle.init(jax.random.PRNGKey(0))
    sd = synthetic_mbv2_state_dict(variables, rng)
    new_vars = torch_import.import_backbone(
        {k: v for k, v in sd.items()}, variables, 'torchvision_mobilenet_v2')

    # every mapped conv kernel matches the transposed torch weight
    kernel = new_vars['params']['features']['base']['stage0']['conv']['kernel']
    expected = sd['features.0.0.weight'].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(kernel), expected)
    # BN running stats landed in batch_stats
    mean = new_vars['batch_stats']['features']['base']['stage0']['bn']['mean']
    np.testing.assert_array_equal(np.asarray(mean),
                                  sd['features.0.1.running_mean'].numpy())
    # the model still runs with imported weights
    scores, locs = bundle.module.apply(
        {'params': new_vars['params'],
         'batch_stats': new_vars['batch_stats']},
        jnp.ones((1, 96, 96, 3)), train=False)
    assert np.isfinite(np.asarray(scores)).all()


def test_convbn_numerical_equivalence_with_torch(rng):
    """flax ConvBn forward == torch conv2d+batch_norm with imported weights."""
    from single_shot_detection_tpu.models.layers import ConvBn
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    w_torch = rng.randn(16, 3, 3, 3).astype(np.float32)
    bn_w = rng.rand(16).astype(np.float32) + 0.5
    bn_b = rng.randn(16).astype(np.float32)
    bn_m = rng.randn(16).astype(np.float32)
    bn_v = rng.rand(16).astype(np.float32) + 0.5

    block = ConvBn(16, kernel_size=3, padding=1, activation=None)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    params['conv']['kernel'] = w_torch.transpose(2, 3, 1, 0)
    params['bn']['scale'] = bn_w
    params['bn']['bias'] = bn_b
    stats = {'bn': {'mean': bn_m, 'var': bn_v}}

    got = block.apply({'params': params, 'batch_stats': stats},
                      jnp.asarray(x), train=False)

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    out = F.conv2d(tx, torch.from_numpy(w_torch), padding=1)
    out = F.batch_norm(out, torch.from_numpy(bn_m), torch.from_numpy(bn_v),
                       torch.from_numpy(bn_w), torch.from_numpy(bn_b),
                       training=False, eps=1e-5)
    expected = out.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)


def test_shufflenet_import_mapping(rng):
    bundle = builder.build(
        base={'name': 'torchvision_shufflenet_v2_x0_5'},
        anchor_generator={'type': 'ssd', 'num_scales': 2, 'min_scale': 0.2,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]] * 2},
        num_classes=4,
        features={'name': 'Features', 'out_layers': (3, 5)},
        input_size=(96, 96))
    variables = bundle.init(jax.random.PRNGKey(0))
    mapping = torch_import.shufflenet_v2_mapping()
    params = variables['params']['features']['base']

    sd = {}
    for torch_prefix, path in mapping.items():
        node = params
        ok = True
        for k in path:
            if k not in node:
                ok = False
                break
            node = node[k]
        if not ok:
            continue
        if 'scale' in node:
            c = node['scale'].shape[0]
            sd[f'{torch_prefix}.weight'] = torch.from_numpy(
                rng.randn(c).astype(np.float32))
            sd[f'{torch_prefix}.bias'] = torch.from_numpy(
                rng.randn(c).astype(np.float32))
            sd[f'{torch_prefix}.running_mean'] = torch.from_numpy(
                rng.randn(c).astype(np.float32))
            sd[f'{torch_prefix}.running_var'] = torch.from_numpy(
                np.abs(rng.randn(c)).astype(np.float32) + 0.5)
        else:
            kh, kw, cin, cout = node['kernel'].shape
            sd[f'{torch_prefix}.weight'] = torch.from_numpy(
                rng.randn(cout, cin, kh, kw).astype(np.float32))
    assert len(sd) > 50

    new_vars = torch_import.import_backbone(
        dict(sd), variables, 'torchvision_shufflenet_v2_x0_5')
    kernel = new_vars['params']['features']['base']['stage2_0']['branch2_dw']['kernel']
    expected = sd['stage2.0.branch2.3.weight'].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(kernel), expected)
    scores, _ = bundle.module.apply(
        {'params': new_vars['params'], 'batch_stats': new_vars['batch_stats']},
        jnp.ones((1, 96, 96, 3)), train=False)
    assert np.isfinite(np.asarray(scores)).all()
