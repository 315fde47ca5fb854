"""Physical pruning materialization: shrink arrays + rebuild a narrow model.

Completes the reference's channel surgery (pruner.py:92-106 slices tensors
in place and patches module attributes) the functional-JAX way: masking
(train/pruning.py) keeps training shapes static; at deploy time this module
slices the param pytree along pruned channels and rebuilds the Detector with
narrower widths, re-jitting once.

Channel dependencies come from the jaxpr analyzer (train/deps.py — the
analog of the reference TraceInspector, trace_inspector.py:167-231): each
*space* lists every array range that shares one channel dimension
(producer kernels axis 3, depthwise kernels, consumer kernels axis 2, and
per-channel vectors like BN scale/bias/mean/var and conv biases), with
per-segment offsets so consumers of concatenated features slice correctly.
Spaces the analyzer cannot prove safe are frozen and skipped with a warning.

Rebuilding the narrow module requires width-override support on the
backbone: MobileNetV2 (``width_overrides``), VGG (per-conv), and
ResNet/ResNeXt (per-block inner widths) are wired; necks beyond plain
``Features`` keep their (frozen, unpruned) widths.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

from single_shot_detection_tpu.train import deps
from single_shot_detection_tpu.train.pruning import _flatten

Path = Tuple[str, ...]


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for path, value in flat.items():
        node = out
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value
    return out


def build_channel_spaces(module, variables, input_size) -> List[deps.Space]:
    """Channel spaces of a detector module (jaxpr analysis, deps.py)."""
    w, h = input_size
    return deps.analyze_module(module, variables, (1, h, w, 3))


def materialize(variables, dead: Dict[Path, set], spaces: List[deps.Space]):
    """Slice away dead channels; returns (variables, widths).

    ``dead`` maps conv *kernel* paths (relative to the params tree, as
    produced by ``Pruner.dead``) -> dead out-channel sets.  ``widths``
    reports the new per-conv out-channel counts for rebuilding the module.
    """
    flat = {k: np.asarray(v) for k, v in _flatten(variables).items()}

    # kernel (path, axis, channel) -> (space, space-channel)
    writer_index: Dict[Tuple[Path, int], List[Tuple[deps.Member, deps.Space]]] = {}
    for s in spaces:
        for m in s.members:
            if m.role in ('producer', 'depthwise'):
                writer_index.setdefault((m.path, m.axis), []).append((m, s))

    # 1) fold per-kernel dead channels into per-space dead sets
    space_dead: Dict[int, set] = {}
    frozen_hits = set()
    for kernel_path, dead_set in dead.items():
        if not dead_set:
            continue
        full = ('params',) + tuple(kernel_path)
        entries = writer_index.get((full, 3), [])
        if not entries:
            logging.warning(f'WW materialize: no channel space for '
                            f'{kernel_path}; skipped')
            continue
        for c in dead_set:
            hit = None
            for m, s in entries:
                if m.offset <= c < m.offset + s.width:
                    hit = (m, s)
                    break
            if hit is None:
                logging.warning(f'WW materialize: channel {c} of '
                                f'{kernel_path} outside every space; skipped')
                continue
            m, s = hit
            if s.frozen:
                frozen_hits.add(kernel_path)
                continue
            space_dead.setdefault(id(s), set()).add(c - m.offset)
    if frozen_hits:
        logging.warning(f'WW materialize: {len(frozen_hits)} pruned kernels '
                        f'live in frozen channel spaces (unsupported '
                        f'topology) and stay masked, not sliced')

    # 2) one keep-mask per (array path, axis), combined across all spaces
    keep_masks: Dict[Tuple[Path, int], np.ndarray] = {}

    def mask_for(path: Path, axis: int) -> np.ndarray:
        key = (path, axis)
        if key not in keep_masks:
            keep_masks[key] = np.ones(flat[path].shape[axis], bool)
        return keep_masks[key]

    by_id = {id(s): s for s in spaces}
    for sid, dead_chs in space_dead.items():
        s = by_id[sid]
        for m in s.members:
            if m.path not in flat:
                continue
            mask = mask_for(m.path, m.axis)
            for d in dead_chs:
                mask[m.offset + d] = False

    for (path, axis), mask in keep_masks.items():
        if mask.all():
            continue
        flat[path] = np.take(flat[path], np.nonzero(mask)[0], axis=axis)

    widths = {k[1:-1]: v.shape[-1] for k, v in flat.items()
              if k[0] == 'params' and k[-1] == 'kernel' and v.ndim == 4}
    return _unflatten(flat), widths


def _stage_indices(params_base) -> List[int]:
    out = []
    for key in params_base:
        if key.startswith('stage'):
            try:
                out.append(int(key[5:]))
            except ValueError:
                continue  # flat names like 'stage0_conv' (MobileNet v1 stem)
    return sorted(out)


def _mobilenet_v2_overrides(params, widths):
    base = ('features', 'base')
    overrides = {}
    for stage in _stage_indices(params['features']['base']):
        mods = params['features']['base'][f'stage{stage}']
        entry = {}
        if 'conv' in mods:
            entry['features'] = widths[base + (f'stage{stage}', 'conv')]
        if 'project_conv' in mods:
            entry['features'] = widths[base + (f'stage{stage}', 'project_conv')]
        if 'expand_conv' in mods:
            entry['inner'] = widths[base + (f'stage{stage}', 'expand_conv')]
        overrides[stage] = entry
    return overrides


def _vgg_overrides(params, widths):
    base = ('features', 'base')
    overrides = {}
    for name in params['features']['base']:
        if name.startswith('conv'):
            overrides[int(name[4:])] = widths[base + (name,)]
    return overrides


def _resnet_overrides(params, widths):
    """Per-block inner widths + per-layer output widths."""
    base = ('features', 'base')
    overrides = {}
    for name in params['features']['base']:
        if not name.startswith('layer'):
            continue
        block = params['features']['base'][name]
        entry = {}
        for conv in ('conv1', 'conv2'):
            if conv in block:
                entry[conv] = widths[base + (name, conv)]
        out_conv = 'conv3' if 'conv3' in block else 'conv2'
        entry['out'] = widths[base + (name, out_conv)]
        overrides[name] = entry
    return overrides


def materialize_bundle(bundle, variables, dead: Dict[Path, set],
                       spaces: Optional[List[deps.Space]] = None):
    """Rebuild a physically narrow DetectorBundle from a masked model.

    Returns ``(new_bundle, new_variables)``; the new model's outputs are
    numerically identical to the masked model's (zeroed channels contribute
    exactly nothing — see train/pruning.py docstring).
    """
    import dataclasses

    from single_shot_detection_tpu.models.builder import DetectorBundle
    from single_shot_detection_tpu.models.mobilenet_v2 import MobileNetV2
    from single_shot_detection_tpu.models.mobilenet import MobileNet
    from single_shot_detection_tpu.models.resnet import ResNet
    from single_shot_detection_tpu.models.vgg import VGG

    if spaces is None:
        spaces = build_channel_spaces(bundle.module, variables,
                                      bundle.input_size)

    new_vars, widths = materialize(variables, dead, spaces)
    params = new_vars['params']

    old_module = bundle.module
    old_backbone = old_module.features.base
    if isinstance(old_backbone, MobileNetV2):
        backbone_overrides = _mobilenet_v2_overrides(params, widths)
        new_backbone = dataclasses.replace(old_backbone,
                                           width_overrides=backbone_overrides)
    elif isinstance(old_backbone, VGG):
        new_backbone = dataclasses.replace(
            old_backbone, width_overrides=_vgg_overrides(params, widths))
    elif isinstance(old_backbone, ResNet):
        new_backbone = dataclasses.replace(
            old_backbone, width_overrides=_resnet_overrides(params, widths))
    elif isinstance(old_backbone, MobileNet):
        stage_widths = {}
        base = ('features', 'base')
        if base + ('stage0_conv',) in widths:
            stage_widths[0] = widths[base + ('stage0_conv',)]
        for stage in _stage_indices(params['features']['base']):
            key = base + (f'stage{stage}', 'pointwise_conv')
            if key in widths:
                stage_widths[stage] = widths[key]
        new_backbone = dataclasses.replace(old_backbone,
                                           width_overrides=stage_widths)
    else:
        raise NotImplementedError(
            f'materialize_bundle: no width-override support for '
            f'{type(old_backbone).__name__}')

    from single_shot_detection_tpu.models.features import FeaturePyramid
    neck_kwargs = {'base': new_backbone}
    if isinstance(old_module.features, FeaturePyramid):
        # laterals share one space (top-down adds union them); output convs
        # are per-level
        lat = widths.get(('features', 'lateral0'))
        outs = []
        i = 0
        while ('features', f'output{i}', 'conv') in widths:
            outs.append(widths[('features', f'output{i}', 'conv')])
            i += 1
        ov = {}
        if lat is not None:
            ov['lateral'] = lat
        if outs:
            ov['output'] = tuple(outs)
        if ov:
            neck_kwargs['width_overrides'] = ov
    new_neck = dataclasses.replace(old_module.features, **neck_kwargs)

    extras_overrides = []
    for i, _ in enumerate(old_module.extras):
        name = f'extra{i}'
        entry = {}
        if (name, 'reduce', 'conv') in widths:
            entry['reduce'] = widths[(name, 'reduce', 'conv')]
        if (name, 'expand', 'pointwise_conv') in widths:
            entry['out'] = widths[(name, 'expand', 'pointwise_conv')]
        elif (name, 'expand', 'conv') in widths:
            entry['out'] = widths[(name, 'expand', 'conv')]
        extras_overrides.append(entry or None)

    new_module = dataclasses.replace(old_module, features=new_neck,
                                     extras_overrides=tuple(extras_overrides))
    new_bundle = DetectorBundle(module=new_module,
                                anchor_generators=bundle.anchor_generators,
                                input_size=bundle.input_size,
                                num_classes=bundle.num_classes)
    out_vars = {'params': params}
    if new_vars.get('batch_stats'):
        out_vars['batch_stats'] = new_vars['batch_stats']
    return new_bundle, out_vars
