"""Physical pruning materialization: shrink arrays + rebuild a narrow model.

Completes the reference's channel surgery (pruner.py:92-106 slices tensors
in place and patches module attributes) the functional-JAX way: masking
(train/pruning.py) keeps training shapes static; at deploy time this module
slices the param pytree along pruned channels and rebuilds the Detector with
narrower widths, re-jitting once.

Channel spaces (the TraceInspector dependency walk, trace_inspector.py:167-231,
rebuilt structurally): a *space* is a set of array axes that share one channel
dimension —
  producers   conv kernels writing the space (axis 3) + their bias/BN arrays
  depthwise   grouped convs flowing the space through (axis 3; in == out)
  consumers   conv kernels reading the space (axis 2)
Supported model family: MobileNetV2-style backbones + plain ``Features`` taps
+ SSD extras + heads (the reference's pruning sample targets exactly this —
ssd_mb2_coco_pruning.py); other necks raise.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from single_shot_detection_tpu.train.pruning import _flatten, _get

Path = Tuple[str, ...]


class ChannelSpace:
    def __init__(self):
        self.producers: List[Path] = []   # conv module paths (kernel axis 3)
        self.depthwise: List[Path] = []   # dw conv module paths (axis 3)
        self.consumers: List[Path] = []   # conv module paths (kernel axis 2)

    def __repr__(self):
        return (f'Space(prod={self.producers}, dw={self.depthwise}, '
                f'cons={self.consumers})')


def _stage_indices(params_base) -> List[int]:
    out = []
    for key in params_base:
        if key.startswith('stage'):
            out.append(int(key[5:]))
    return sorted(out)


def build_channel_spaces(params) -> List[ChannelSpace]:
    """Channel spaces for the MobileNetV2 + Features + extras + heads tree."""
    flat = _flatten(params)
    if any(p[0] not in ('features', 'score_head0', 'loc_head0') and
           not p[0].startswith(('extra', 'score_head', 'loc_head', 'features'))
           for p in flat):
        unknown = {p[0] for p in flat
                   if not p[0].startswith(('extra', 'score_head', 'loc_head',
                                           'features'))}
        raise NotImplementedError(f'unsupported detector parts: {unknown}')
    if 'base' not in params.get('features', {}):
        raise NotImplementedError('materialize supports the plain Features '
                                  'neck only')

    base = ('features', 'base')
    base_params = params['features']['base']
    stages = _stage_indices(base_params)
    spaces: List[ChannelSpace] = []

    def stage_mods(i):
        return set(base_params[f'stage{i}'].keys())

    # --- inner (expand) spaces per stage -----------------------------------
    for i in stages:
        mods = stage_mods(i)
        if 'expand_conv' in mods:
            s = ChannelSpace()
            s.producers.append(base + (f'stage{i}', 'expand_conv'))
            s.depthwise.append(base + (f'stage{i}', 'depthwise_conv'))
            s.consumers.append(base + (f'stage{i}', 'project_conv'))
            spaces.append(s)

    # --- stage-output spaces (with residual chains) -------------------------
    # output producer per stage: conv (stem/head stages) or project_conv
    def out_producer(i):
        mods = stage_mods(i)
        return (f'stage{i}', 'conv') if 'conv' in mods else (f'stage{i}',
                                                             'project_conv')

    def out_channels(i):
        mod = out_producer(i)
        return flat[base + mod + ('kernel',)].shape[-1]

    # group consecutive same-width residual stages (parity with
    # pruning.residual_groups)
    # a stage extends the previous chain iff it's a residual block writing the
    # same width (MobileNetV2 never keeps width across a stride-2 stage, so
    # equal consecutive project widths == residual chain)
    chains: List[List[int]] = []
    for i in stages:
        if (chains and 'project_conv' in stage_mods(i) and
                out_channels(chains[-1][-1]) == out_channels(i)):
            chains[-1].append(i)
        else:
            chains.append([i])

    # tap consumers: heads + extras reduce; find them by matching in-channels
    head_paths = [p[:-1] for p in flat
                  if p[0].startswith(('score_head', 'loc_head'))
                  and p[-1] == 'kernel']
    extra_parts = {}
    for p in flat:
        if p[0].startswith('extra') and p[-1] == 'kernel':
            extra_parts.setdefault(p[0], set()).add(p[1:-1])

    for chain in chains:
        s = ChannelSpace()
        for i in chain:
            mod = out_producer(i)
            s.producers.append(base + mod)
        last = chain[-1]
        # next stage's first conv consumes this space
        nxt = [j for j in stages if j > last]
        if nxt:
            j = nxt[0]
            mods = stage_mods(j)
            if 'expand_conv' in mods:
                s.consumers.append(base + (f'stage{j}', 'expand_conv'))
            elif 'depthwise_conv' in mods:  # stage1: dw flows the space
                s.depthwise.append(base + (f'stage{j}', 'depthwise_conv'))
                s.consumers.append(base + (f'stage{j}', 'project_conv'))
            else:
                s.consumers.append(base + (f'stage{j}', 'conv'))
        spaces.append(s)

    # --- extras chain --------------------------------------------------------
    # extra{k}: reduce (1x1) -> expand (ConvBn | DepthwiseConvBn)
    extra_names = sorted(extra_parts.keys(), key=lambda n: int(n[5:]))
    for name in extra_names:
        parts = extra_parts[name]
        s = ChannelSpace()  # reduce-out space
        s.producers.append((name, 'reduce', 'conv'))
        if ('expand', 'depthwise_conv') in parts:
            s.depthwise.append((name, 'expand', 'depthwise_conv'))
            s.consumers.append((name, 'expand', 'pointwise_conv'))
        else:
            s.consumers.append((name, 'expand', 'conv'))
        spaces.append(s)

    # --- wire tap/extra-output spaces to their consumers ---------------------
    # match consumers to spaces by in-channel width + ordering:
    # sources = [tap stages...] + [extra outputs...]; heads are per-source.
    def space_width(s):
        return flat[s.producers[0] + ('kernel',)].shape[-1]

    # heads: score_head{i}/loc_head{i} consume source i
    # sources: Features out_layers (taps into stage outputs) then extras.
    # We can identify tapped stages by matching head in-channels is ambiguous;
    # instead: extras outputs are extra{k}.expand out; taps are the stages
    # whose output space is consumed by extra0.reduce (last tap) — the
    # builder wires taps positionally, so derive from head count:
    num_sources = len({p[0] for p in head_paths if p[0].startswith('score_head')})
    num_extras = len(extra_names)
    num_taps = num_sources - num_extras

    # tap stages: reference configs tap monotonically increasing stages with
    # the LAST tap being the final stage; find candidate stage-output spaces
    # by matching head in-channels in order.
    head_in = {}
    for p in head_paths:
        head_in[p] = flat[p + ('kernel',)].shape[2]

    stage_out_spaces = [s for s in spaces
                        if s.producers[0][:2] == base and
                        s.producers[0][2:][0].startswith('stage') and
                        (s.producers[0][-1] in ('conv', 'project_conv'))]
    # in stage order
    stage_out_spaces.sort(key=lambda s: int(s.producers[0][2][5:]))

    tap_spaces: List[ChannelSpace] = []
    needed = []
    for i in range(num_taps):
        needed.append((f'score_head{i}', ), )
    used = set()
    for i in range(num_taps):
        want = flat[(f'score_head{i}', 'kernel')].shape[2]
        match = None
        for s in stage_out_spaces:
            if id(s) in used:
                continue
            if space_width(s) == want:
                match = s
        # prefer the LAST matching stage (taps are late stages)
        if match is None:
            raise NotImplementedError(
                f'cannot wire head {i} (in={want}) to a stage output space')
        used.add(id(match))
        tap_spaces.append(match)
    tap_spaces.sort(key=lambda s: int(s.producers[0][2][5:]))

    for i, s in enumerate(tap_spaces):
        s.consumers.append((f'score_head{i}',))
        s.consumers.append((f'loc_head{i}',))
    # the last tap also feeds extra0.reduce
    if extra_names:
        tap_spaces[-1].consumers.append((extra_names[0], 'reduce', 'conv'))

    # extra outputs feed heads (num_taps + k) and the next extra's reduce
    for k, name in enumerate(extra_names):
        s = ChannelSpace()
        if (('expand', 'pointwise_conv') in extra_parts[name]):
            s.producers.append((name, 'expand', 'pointwise_conv'))
        else:
            s.producers.append((name, 'expand', 'conv'))
        idx = num_taps + k
        s.consumers.append((f'score_head{idx}',))
        s.consumers.append((f'loc_head{idx}',))
        if k + 1 < len(extra_names):
            s.consumers.append((extra_names[k + 1], 'reduce', 'conv'))
        spaces.append(s)

    return spaces


_BN_SIBLING = {'conv': 'bn', 'depthwise_conv': 'depthwise_bn',
               'pointwise_conv': 'pointwise_bn', 'expand_conv': 'expand_bn',
               'project_conv': 'project_bn', }
# extras blocks name their single conv 'conv' under reduce/expand ConvBn
# modules; DepthwiseConvBn uses depthwise_/pointwise_ prefixes.


def _bn_path(conv_path: Path) -> Optional[Path]:
    name = conv_path[-1]
    bn = _BN_SIBLING.get(name)
    if bn is None:
        return None
    return conv_path[:-1] + (bn,)


def _slice_axis(arr, keep, axis):
    return np.take(np.asarray(arr), keep, axis=axis)


def materialize(params, batch_stats, dead: Dict[Path, set]):
    """Slice away dead channels; returns (params, batch_stats, widths).

    ``dead`` maps conv *kernel* paths -> dead channel sets (Pruner.dead).
    ``widths`` reports the new per-conv out-channel counts for rebuilding the
    module (models/builder.py width overrides).
    """
    spaces = build_channel_spaces(params)
    flat_params = {k: np.asarray(v) for k, v in _flatten(params).items()}
    flat_stats = {k: np.asarray(v) for k, v in _flatten(batch_stats).items()}

    # map kernel path -> space
    by_producer: Dict[Path, ChannelSpace] = {}
    for s in spaces:
        for p in s.producers + s.depthwise:
            by_producer[p + ('kernel',)] = s

    handled = set()
    for kernel_path, dead_set in dead.items():
        if not dead_set:
            continue
        space = by_producer.get(kernel_path)
        if space is None:
            logging.warning(f'WW materialize: no channel space for '
                            f'{kernel_path}; skipped')
            continue
        if id(space) in handled:
            continue
        handled.add(id(space))

        width = flat_params[kernel_path].shape[-1]
        # dead channels of the whole space = union over its producers/dw
        space_dead = set()
        for p in space.producers + space.depthwise:
            space_dead |= dead.get(p + ('kernel',), set())
        keep = [c for c in range(width) if c not in space_dead]
        if len(keep) == width:
            continue

        for mod in space.producers + space.depthwise:
            kp = mod + ('kernel',)
            flat_params[kp] = _slice_axis(flat_params[kp], keep, 3)
            bp = mod + ('bias',)
            if bp in flat_params:
                flat_params[bp] = _slice_axis(flat_params[bp], keep, 0)
            bn = _bn_path(mod)
            if bn is not None:
                for field in ('scale', 'bias'):
                    p = bn + (field,)
                    if p in flat_params:
                        flat_params[p] = _slice_axis(flat_params[p], keep, 0)
                for field in ('mean', 'var'):
                    p = bn + (field,)
                    if p in flat_stats:
                        flat_stats[p] = _slice_axis(flat_stats[p], keep, 0)
        for mod in space.consumers:
            kp = mod + ('kernel',)
            flat_params[kp] = _slice_axis(flat_params[kp], keep, 2)

    widths = {k[:-1]: v.shape[-1] for k, v in flat_params.items()
              if k[-1] == 'kernel' and v.ndim == 4}
    return _unflatten(flat_params), _unflatten(flat_stats), widths


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for path, value in flat.items():
        node = out
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = value
    return out


def materialize_bundle(bundle, variables, dead: Dict[Path, set]):
    """Rebuild a physically narrow DetectorBundle from a masked model.

    Returns ``(new_bundle, new_variables)``; the new model's outputs are
    numerically identical to the masked model's (zeroed channels contribute
    exactly nothing — see train/pruning.py docstring).
    """
    import dataclasses

    from single_shot_detection_tpu.models.builder import DetectorBundle
    from single_shot_detection_tpu.models.mobilenet_v2 import MobileNetV2

    params, batch_stats, widths = materialize(
        variables['params'], variables.get('batch_stats', {}), dead)

    old_module = bundle.module
    old_backbone = old_module.features.base
    if not isinstance(old_backbone, MobileNetV2):
        raise NotImplementedError('materialize_bundle supports MobileNetV2 '
                                  'backbones (the reference pruning target)')

    base = ('features', 'base')
    backbone_overrides = {}
    for stage in _stage_indices(params['features']['base']):
        mods = params['features']['base'][f'stage{stage}']
        entry = {}
        if 'conv' in mods:
            entry['features'] = widths[base + (f'stage{stage}', 'conv')]
        if 'project_conv' in mods:
            entry['features'] = widths[base + (f'stage{stage}', 'project_conv')]
        if 'expand_conv' in mods:
            entry['inner'] = widths[base + (f'stage{stage}', 'expand_conv')]
        backbone_overrides[stage] = entry

    new_backbone = dataclasses.replace(old_backbone,
                                       width_overrides=backbone_overrides)
    new_neck = dataclasses.replace(old_module.features, base=new_backbone)

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
    new_variables = {'params': params}
    if batch_stats:
        new_variables['batch_stats'] = batch_stats
    return new_bundle, new_variables
