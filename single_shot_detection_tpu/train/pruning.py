"""Structured channel pruning.

Functional-parity targets: reference ``bf/training/pruning/`` — ``Pruner``
(pruner.py:64-106), importance criterions (criterions.py: RandomSampling /
MinL1Norm / MinL2Norm / MeanActivation / TaylorExpansion), and the
TraceInspector's cross-layer channel dependency propagation
(trace_inspector.py:167-231).

TPU-first redesign (SURVEY.md §7.10): XLA cannot do in-place surgery on live
arrays, and shape changes force recompiles.  Channel "removal" is therefore
realized as **exact masking**:

  * pruning channel ``c`` of a conv zeroes its kernel out-slice, bias, and —
    crucially — its BatchNorm ``scale``/``bias`` (a BN with zero scale+bias
    emits exactly 0 regardless of running stats, and every activation in the
    zoo maps 0 -> 0), so downstream consumers see *identical math* to
    physical removal;
  * gradients are kept from resurrecting dead channels by a mask inside the
    optimizer (``masked`` optax wrapper) — the analog of the reference
    slicing ``grad`` too (pruner.py:17-21);
  * concat dependencies (trace_inspector concat-group remapping) vanish —
    a zeroed producer channel is a zeroed concat channel;
  * residual-add dependencies remain: all writers into a shared channel
    space are pruned together (``connected`` groups, criterions.py:46-76) —
    computed structurally from the model's block metadata instead of an
    ONNX trace.

Physical re-materialization (actually shrinking arrays + re-jit) can be
layered on top for deployment; masked channels already contribute zero FLOPs
of information and XLA-level sparsity where fusable.
"""

from __future__ import annotations

import logging
import random
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Path = Tuple[str, ...]


# ---------------------------------------------------------------------------
# param-tree navigation
# ---------------------------------------------------------------------------

def _flatten(params, prefix=()):
    out = {}
    for k, v in params.items():
        if isinstance(v, dict) or hasattr(v, 'items'):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def conv_kernel_paths(params) -> List[Path]:
    """All 4D conv kernels ``[kh, kw, cin, cout]`` in the tree."""
    return [p for p, v in _flatten(params).items()
            if p[-1] == 'kernel' and getattr(v, 'ndim', 0) == 4]


def _module_path(kernel_path: Path) -> Path:
    """Drop the trailing ('conv-ish', 'kernel') to get the block path."""
    return kernel_path[:-2]


def _get(params, path):
    node = params
    for k in path:
        node = node[k]
    return node


def _set(params, path, value):
    import copy
    params = dict(params)
    node = params
    for k in path[:-1]:
        node[k] = dict(node[k])
        node = node[k]
    node[path[-1]] = value
    return params


def _companions(params, kernel_path: Path) -> List[Tuple[Path, int]]:
    """Arrays that must be zeroed along with a conv's out-channel: the conv
    bias and the sibling BatchNorm's scale/bias (the replacement for
    _remove_batchnorm_channel, pruner.py:54-62).

    Returns (path, axis) pairs; the kernel itself uses axis -1.
    """
    flat = _flatten(params)
    module = _module_path(kernel_path)
    conv_name = kernel_path[-2]
    out = [(kernel_path, 3)]
    bias_path = module + (conv_name, 'bias')
    if bias_path in flat:
        out.append((bias_path, 0))
    # sibling bn: conv -> bn, depthwise_conv -> depthwise_bn, etc.
    bn_name = {'conv': 'bn',
               'depthwise_conv': 'depthwise_bn',
               'pointwise_conv': 'pointwise_bn',
               'expand_conv': 'expand_bn',
               'project_conv': 'project_bn'}.get(conv_name)
    if bn_name is not None:
        for field in ('scale', 'bias'):
            p = module + (bn_name, field)
            if p in flat:
                out.append((p, 0))
    return out


# ---------------------------------------------------------------------------
# residual writer groups (the TraceInspector's `connected` analog)
# ---------------------------------------------------------------------------

def residual_groups(params) -> Dict[Path, List[Path]]:
    """Map each conv kernel path to the set of kernels writing into the same
    channel space through residual adds.

    Structural rule for the MobileNetV2-style inverted-residual chains
    (mobilenet_v2.py: residual iff same-channel stride-1): consecutive
    ``stageN/project_conv`` kernels with equal out-channels form one group
    together with the producer that enters the chain.  Sequential towers
    (VGG, MobileNet v1, extras, ShuffleNet mains) are their own groups.
    """
    flat = _flatten(params)
    kernels = conv_kernel_paths(params)
    groups: Dict[Path, List[Path]] = {k: [k] for k in kernels}

    # locate backbone stage chains: paths like (..., 'stageN', 'project_conv',
    # 'kernel'); chain = runs of stages with equal project out-channels.
    by_parent: Dict[Path, Dict[int, Path]] = {}
    for k in kernels:
        if len(k) >= 3 and k[-2] == 'project_conv' and k[-3].startswith('stage'):
            parent = k[:-3]
            try:
                idx = int(k[-3][5:])
            except ValueError:
                continue
            by_parent.setdefault(parent, {})[idx] = k

    for parent, stage_map in by_parent.items():
        chain: List[Path] = []
        prev_c = None
        for idx in sorted(stage_map):
            k = stage_map[idx]
            c = flat[k].shape[-1]
            if prev_c == c:
                chain.append(k)
            else:
                if len(chain) > 1:
                    for member in chain:
                        groups[member] = list(chain)
                chain = [k]
            prev_c = c
        if len(chain) > 1:
            for member in chain:
                groups[member] = list(chain)
    return groups


# ---------------------------------------------------------------------------
# criterions (parity: criterions.py)
# ---------------------------------------------------------------------------

class Criterion:
    """Scores channels; lower = pruned first."""

    needs_activations = False

    def __init__(self, params, include_paths: Optional[Sequence[str]] = None,
                 **_):
        self.include_paths = include_paths

    def _included(self, params) -> List[Path]:
        kernels = conv_kernel_paths(params)
        if not self.include_paths:
            return kernels
        def name(p):
            return '.'.join(p)
        return [k for k in kernels
                if any(name(k).startswith(ip) or ip in name(k)
                       for ip in self.include_paths)]

    def scores(self, params, aux=None) -> Dict[Path, np.ndarray]:
        raise NotImplementedError


class MinL1Norm(Criterion):
    def scores(self, params, aux=None):
        flat = _flatten(params)
        return {k: np.asarray(jnp.sum(jnp.abs(flat[k]), axis=(0, 1, 2)))
                for k in self._included(params)}


class MinL2Norm(Criterion):
    def scores(self, params, aux=None):
        flat = _flatten(params)
        return {k: np.asarray(jnp.sqrt(jnp.sum(flat[k] ** 2, axis=(0, 1, 2))))
                for k in self._included(params)}


class RandomSampling(Criterion):
    def __init__(self, params, include_paths=None, seed: int = 0, **_):
        super().__init__(params, include_paths)
        self.rng = random.Random(seed)

    def scores(self, params, aux=None):
        flat = _flatten(params)
        return {k: np.asarray([self.rng.random()
                               for _ in range(flat[k].shape[-1])])
                for k in self._included(params)}


class MeanActivation(Criterion):
    """EMA of per-channel mean activation (parity: _hooks.py
    _mean_activation_hook); fed by ``Pruner.observe`` from flax
    capture_intermediates instead of forward hooks."""

    needs_activations = True

    def __init__(self, params, include_paths=None, momentum: float = 0.9, **_):
        super().__init__(params, include_paths)
        self.momentum = momentum
        self.ema: Dict[Path, np.ndarray] = {}

    def update(self, acts: Dict[Path, np.ndarray]):
        for k, v in acts.items():
            if k in self.ema:
                self.ema[k] = self.momentum * self.ema[k] + (1 - self.momentum) * v
            else:
                self.ema[k] = v

    def scores(self, params, aux=None):
        flat = _flatten(params)
        out = {}
        for k in self._included(params):
            # prefer the conv submodule's own output (correct channel count,
            # like the reference's per-conv hooks); fall back to the block
            # output when lengths agree
            for key in (k[:-1], _module_path(k)):
                mean = self.ema.get(key)
                if mean is not None and len(mean) == flat[k].shape[-1]:
                    out[k] = mean
                    break
        return out


class TaylorExpansion(Criterion):
    """|dL/dW * W| per out-channel, EMA'd — the weight-level form of
    Molchanov pruning (arXiv 1611.06440; the reference's activation-level
    hook variant, _hooks.py:24-29, has no functional analog without
    mutable hooks)."""

    needs_activations = False

    def __init__(self, params, include_paths=None, momentum: float = 0.9, **_):
        super().__init__(params, include_paths)
        self.momentum = momentum
        self.ema: Dict[Path, np.ndarray] = {}

    def update_from_grads(self, params, grads):
        flat_p = _flatten(params)
        flat_g = _flatten(grads)
        for k in self._included(params):
            value = np.asarray(jnp.abs(flat_g[k] * flat_p[k]).mean(axis=(0, 1, 2)))
            norm = np.linalg.norm(value) + 1e-8
            value = value / norm
            if k in self.ema:
                self.ema[k] = self.momentum * self.ema[k] + (1 - self.momentum) * value
            else:
                self.ema[k] = value

    def scores(self, params, aux=None):
        return {k: v for k, v in self.ema.items() if k in self._included(params)}


CRITERIONS = {
    'RandomSampling': RandomSampling,
    'MinL1Norm': MinL1Norm,
    'MinL2Norm': MinL2Norm,
    'MeanActivation': MeanActivation,
    'TaylorExpansion': TaylorExpansion,
}


# ---------------------------------------------------------------------------
# the optimizer mask (keeps dead channels dead; pruner.py grad slicing analog)
# ---------------------------------------------------------------------------

def masked(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Wrap an optimizer so updates are multiplied by a mutable mask tree.

    The mask lives in the optimizer state (``MaskedState.mask``) with the
    same treedef as params; leaves are broadcastable (scalar 1.0 by default).
    """

    def init_fn(params):
        mask = jax.tree_util.tree_map(lambda _: jnp.ones((), jnp.float32),
                                      params)
        return {'inner': inner.init(params), 'mask': mask}

    def update_fn(updates, state, params=None):
        new_updates, inner_state = inner.update(updates, state['inner'], params)
        new_updates = jax.tree_util.tree_map(lambda u, m: u * m,
                                             new_updates, state['mask'])
        return new_updates, {'inner': inner_state, 'mask': state['mask']}

    return optax.GradientTransformation(init_fn, update_fn)


class Pruner:
    """Iterative channel pruner (parity: pruner.py:64-106).

    ``prune(state)`` scores channels, picks the global bottom-``num`` (with
    residual-group sharing and last-channel protection), and returns a new
    TrainState with those channels exactly zeroed in params and masked in
    the optimizer.

    When ``spaces`` (train/deps.py jaxpr analysis) is provided, writer
    groups and the per-channel companion arrays (BN scale/bias, conv bias)
    come from the traced dataflow — exact for ANY topology; otherwise the
    structural MobileNetV2-convention fallback (``residual_groups`` +
    name-mapped BN siblings) is used.
    """

    def __init__(self, params, criterion: dict,
                 include_paths: Optional[Sequence[str]] = None, num: int = 1,
                 spaces=None):
        self.num = num
        name = criterion['name']
        self.criterion = CRITERIONS[name](params, include_paths,
                                          **criterion.get('args', {}))
        self.spaces = spaces
        self._space_index = None
        if spaces is not None:
            self._space_index = self._index_spaces(spaces)
            self.groups = self._groups_from_spaces(spaces, params)
            # ensure every kernel has a group entry
            for k in conv_kernel_paths(params):
                self.groups.setdefault(k, [k])
        else:
            self.groups = residual_groups(params)
        self.dead: Dict[Path, set] = {}

    @staticmethod
    def _index_spaces(spaces):
        """kernel param-tree path -> [(space, writer member)]."""
        idx: Dict[Path, list] = {}
        for s in spaces:
            for m in s.members:
                if m.role in ('producer', 'depthwise') and m.path[0] == 'params':
                    idx.setdefault(m.path[1:], []).append((s, m))
        return idx

    @staticmethod
    def _groups_from_spaces(spaces, params) -> Dict[Path, List[Path]]:
        """Writers of one space prune together (criterions.py:46-76 analog).

        Only full-width, zero-offset writers join a group — a depthwise
        kernel spanning a concatenation keeps its own scores.  Both halves
        of that condition are checked: offset == 0 AND the kernel's sliced
        axis equals the space width (a wider kernel whose first segment
        starts at 0 would otherwise join a group of different-width scores
        and crash np.stack in _group_scores).
        """
        def _full_width(m, s):
            if m.offset != 0:
                return False
            arr = _get(params, m.path[1:])
            return arr.shape[m.axis] == s.width

        groups: Dict[Path, List[Path]] = {}
        for s in spaces:
            writers = [m.path[1:] for m in s.members
                       if m.role in ('producer', 'depthwise')
                       and m.path[0] == 'params' and _full_width(m, s)]
            if len(writers) > 1:
                for w in writers:
                    groups[w] = list(writers)
        return groups

    def _space_companions(self, kernel_path: Path, channel: int):
        """(path, axis, index) triples to zero for one pruned channel, from
        the traced dataflow; None when the kernel is in no analyzed space."""
        entries = self._space_index.get(kernel_path) if self._space_index else None
        if not entries:
            return None
        for s, m in entries:
            if m.offset <= channel < m.offset + s.width:
                space_ch = channel - m.offset
                out = [(kernel_path, 3, channel)]
                for v in s.members:
                    if v.role == 'vector' and v.path[0] == 'params':
                        out.append((v.path[1:], 0, v.offset + space_ch))
                return out
        return None

    def _group_scores(self, scores: Dict[Path, np.ndarray]) -> Dict[Path, np.ndarray]:
        """Share scores across residual writer groups by elementwise max
        (parity: _share_connected, criterions.py:46-76)."""
        out = {}
        seen = set()
        for k, s in scores.items():
            group = [g for g in self.groups.get(k, [k]) if g in scores]
            key = tuple(sorted(group))
            if key in seen:
                continue
            seen.add(key)
            stacked = np.stack([scores[g] for g in group])
            out[k] = stacked.max(axis=0)
        return out

    def select(self, params) -> List[Tuple[Path, int]]:
        scores = self.criterion.scores(params)
        if not scores:
            return []
        grouped = self._group_scores(scores)

        entries = []
        for k, s in grouped.items():
            dead = self.dead.get(k, set())
            alive = [c for c in range(len(s)) if c not in dead]
            if len(alive) <= 1:
                continue  # never kill a layer (parity: _exclude_last_layer)
            for c in alive:
                entries.append((float(s[c]), k, c))
        entries.sort()
        picked = []
        per_layer_alive = {k: len(s) - len(self.dead.get(k, set()))
                           for k, s in grouped.items()}
        for score, k, c in entries:
            if len(picked) >= self.num:
                break
            if per_layer_alive[k] <= 1:
                continue
            picked.append((k, c))
            per_layer_alive[k] -= 1
        return picked

    def prune(self, state):
        """Zero the selected channels in params and mask them in opt_state."""
        picked = self.select(state.params)
        if not picked:
            logging.info('Pruned channels: Nothing!')
            return state

        params = jax.tree_util.tree_map(lambda x: x, state.params)  # copy refs
        mask_updates: Dict[Path, np.ndarray] = {}
        logging.info('Pruned channels:')
        for kernel_path, channel in picked:
            for member in self.groups.get(kernel_path, [kernel_path]):
                self.dead.setdefault(member, set()).add(channel)
                logging.info(f'{".".join(member)} #{channel}')
                companions = self._space_companions(member, channel)
                if companions is None:
                    companions = [(p, a, channel)
                                  for p, a in _companions(params, member)]
                for path, axis, index in companions:
                    arr = _get(params, path)
                    zeroed = arr * self._keep_mask(arr, axis, index)
                    params = _set(params, path, zeroed)
                    flat_key = path
                    m = mask_updates.get(flat_key)
                    if m is None:
                        m = np.ones(arr.shape[axis] if arr.ndim else 1,
                                    np.float32)
                    m[index] = 0.0
                    mask_updates[flat_key] = m

        opt_state = self._apply_mask_updates(state.opt_state, state.params,
                                             mask_updates)
        return state.replace(params=params, opt_state=opt_state)

    @staticmethod
    def _keep_mask(arr, axis, channel):
        shape = [1] * arr.ndim
        shape[axis] = arr.shape[axis]
        m = jnp.ones((arr.shape[axis],), arr.dtype).at[channel].set(0)
        return m.reshape(shape)

    def _apply_mask_updates(self, opt_state, params, mask_updates):
        """Install per-channel masks into the ``masked()`` wrapper state.

        Containers are rebuilt first so the caller's state object is never
        mutated (leaves stay shared — jax arrays are immutable anyway).
        """
        opt_state = jax.tree_util.tree_map(lambda x: x, opt_state)

        def find_masked(node):
            if isinstance(node, dict) and 'mask' in node and 'inner' in node:
                return node
            if isinstance(node, (tuple, list)):
                for item in node:
                    found = find_masked(item)
                    if found is not None:
                        return found
            return None

        holder = find_masked(opt_state)
        if holder is None:
            logging.warning('WW optimizer has no masked() wrapper — pruned '
                            'channels may regrow; wrap the optimizer with '
                            'pruning.masked()')
            return opt_state

        mask = holder['mask']
        flat_mask = _flatten(mask) if isinstance(mask, dict) else None
        new_mask = mask
        for path, m in mask_updates.items():
            leaf = _get(new_mask, path)
            target = _get(params, path)
            shape = [1] * target.ndim
            axis = 3 if path[-1] == 'kernel' and target.ndim == 4 else 0
            shape[axis] = target.shape[axis]
            current = (jnp.broadcast_to(leaf, ())
                       if getattr(leaf, 'ndim', 0) == 0 else leaf)
            new_leaf = jnp.asarray(m).reshape(shape)
            if getattr(current, 'ndim', 0) != 0:
                new_leaf = new_leaf * current.reshape(shape)
            new_mask = _set(new_mask, path, new_leaf)
        del flat_mask
        holder['mask'] = new_mask
        return opt_state

    def observe(self, acts):
        """Feed activations to activation-based criterions.

        Accepts either raw flax ``intermediates`` or the flat per-channel
        means produced (on-device) by ``activation_means`` — the engine uses
        the latter so only tiny 1-D vectors cross to the host.
        """
        if not isinstance(self.criterion, MeanActivation):
            return
        if acts and all(isinstance(k, tuple) for k in acts):
            means = {k: np.asarray(v) for k, v in acts.items()}
        else:
            means = {}
            for path, value in _flatten(acts).items():
                if path[-1] == '__call__':
                    v = value[0] if isinstance(value, tuple) else value
                    if getattr(v, 'ndim', 0) == 4:
                        means[path[:-1]] = np.asarray(v.mean(axis=(0, 1, 2)))
        self.criterion.update(means)

    def observe_grads(self, params, grads):
        if isinstance(self.criterion, TaylorExpansion):
            self.criterion.update_from_grads(params, grads)


def activation_means(intermediates) -> Dict[Path, jnp.ndarray]:
    """Per-channel means of every captured 4-D activation, computed ON
    DEVICE (jit-friendly): the engine's replacement for the reference's
    forward hooks (_hooks.py:4-22)."""
    out = {}
    for path, value in _flatten(intermediates).items():
        if path[-1] == '__call__':
            v = value[0] if isinstance(value, tuple) else value
            if isinstance(v, tuple):
                v = v[0]
            if getattr(v, 'ndim', 0) == 4:
                out[path[:-1]] = v.mean(axis=(0, 1, 2))
    return out
