"""Channel-dependency extraction from jaxprs.

The TPU-native analog of the reference's TraceInspector
(``bf/training/pruning/trace_inspector.py:46-231``), which walked an ONNX
trace to propagate channel removal across layers.  Here the traced program
IS the source of truth: ``jax.make_jaxpr(module.apply)`` yields every
primitive the model executes, and an abstract interpreter over that jaxpr
tracks which array axes carry which *channel spaces*.

A **channel space** is an equivalence class of array slices that must be
pruned together:

  * ``producer``  — conv kernels whose out-channel axis mints the space
  * ``depthwise`` — grouped convs flowing the space through (in == out)
  * ``consumer``  — conv kernels reading the space on their in-channel axis
  * ``vector``    — per-channel 1-D params combined elementwise with the
                    space (BatchNorm scale/bias/mean/var, conv biases) —
                    discovered from the *math*, not from name conventions

Residual adds union the spaces of both operands (union-find); channel-axis
concatenation makes multi-segment annotations with per-segment offsets, so a
consumer of concatenated features records where each space lands inside its
kernel's in-axis.  Anything the interpreter cannot prove safe (reshapes that
split the channel axis, unknown primitives, data-dependent mixing) *freezes*
the spaces involved — frozen spaces are never materialized, so unsupported
topologies degrade to "not pruned" instead of silent corruption.

Supports every backbone/neck in the zoo structurally (MobileNet v1/v2, VGG,
ResNet/ResNeXt residual+downsample joins, SSD extras, FPN top-down adds);
the physical rebuild side (train/materialize.py) additionally needs the
module to accept width overrides.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

Path = Tuple[str, ...]

# ---------------------------------------------------------------------------
# spaces and members
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Member:
    """One sliceable array range belonging to a space.

    ``path`` is the variables-tree path INCLUDING the collection
    (('params', ...) or ('batch_stats', ...)); ``axis`` the sliced axis;
    ``offset`` where the space's channels start along that axis.
    """
    path: Path
    axis: int
    offset: int
    role: str  # 'producer' | 'depthwise' | 'consumer' | 'vector'


class _SpaceSet:
    """Union-find over space ids with per-root members/width/frozen."""

    def __init__(self):
        self.parent: List[int] = []
        self.width: List[int] = []
        self.members: List[List[Member]] = []
        self.frozen: List[bool] = []

    def fresh(self, width: int, frozen: bool = False) -> int:
        sid = len(self.parent)
        self.parent.append(sid)
        self.width.append(width)
        self.members.append([])
        self.frozen.append(frozen)
        return sid

    def find(self, sid: int) -> int:
        while self.parent[sid] != sid:
            self.parent[sid] = self.parent[self.parent[sid]]
            sid = self.parent[sid]
        return sid

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        assert self.width[ra] == self.width[rb], 'cannot union unequal widths'
        self.parent[rb] = ra
        self.members[ra].extend(self.members[rb])
        self.members[rb] = []
        self.frozen[ra] = self.frozen[ra] or self.frozen[rb]

    def add_member(self, sid: int, member: Member):
        self.members[self.find(sid)].append(member)

    def freeze(self, sid: int):
        self.frozen[self.find(sid)] = True


@dataclasses.dataclass
class Space:
    """Final, resolved channel space."""
    width: int
    members: Tuple[Member, ...]
    frozen: bool

    def by_role(self, role: str) -> List[Member]:
        return [m for m in self.members if m.role == role]


# ---------------------------------------------------------------------------
# annotations
# ---------------------------------------------------------------------------

_UNIFORM = 'uniform'  # constant along every axis (scalars, broadcast scalars)


@dataclasses.dataclass(frozen=True)
class ChanAnn:
    """The array's ``axis`` is partitioned into space segments."""
    axis: int
    segments: Tuple[Tuple[int, int], ...]  # (space_id, size)


@dataclasses.dataclass(frozen=True)
class VecAnn:
    """A per-channel vector derived solely from 1-D params (+ scalars):
    carries the set of param paths awaiting registration into a space."""
    axis: int
    size: int
    paths: frozenset


class _Interp:
    def __init__(self, spaces: _SpaceSet):
        self.spaces = spaces
        self.tainted: set = set()  # vec param paths that leaked to unknowns

    # -- helpers ------------------------------------------------------------

    def _freeze_ann(self, ann):
        if isinstance(ann, ChanAnn):
            for sid, _ in ann.segments:
                self.spaces.freeze(sid)
        elif isinstance(ann, VecAnn):
            self.tainted |= ann.paths

    def _register_vec(self, vec: VecAnn, chan: ChanAnn):
        off = 0
        for sid, size in chan.segments:
            for path in vec.paths:
                self.spaces.add_member(
                    sid, Member(path=path, axis=0, offset=off, role='vector'))
            off += size

    def _combine(self, a, b, out_shape):
        """Binary elementwise combine of two annotations."""
        for x, y in ((a, b), (b, a)):
            if isinstance(x, ChanAnn):
                if y is None:
                    self._freeze_ann(x)
                    return None
                if y == _UNIFORM:
                    return x
                if isinstance(y, VecAnn):
                    if (y.axis == x.axis
                            and y.size == sum(s for _, s in x.segments)):
                        self._register_vec(y, x)
                        return x
                    self._freeze_ann(x)
                    self.tainted |= y.paths
                    return None
                # ChanAnn + ChanAnn
                if x.axis != y.axis or \
                        [s for _, s in x.segments] != [s for _, s in y.segments]:
                    self._freeze_ann(x)
                    self._freeze_ann(y)
                    return None
                for (sa, _), (sb, _) in zip(x.segments, y.segments):
                    self.spaces.union(sa, sb)
                return x
        for x, y in ((a, b), (b, a)):
            if isinstance(x, VecAnn):
                if y == _UNIFORM:
                    return x
                if isinstance(y, VecAnn):
                    if x.axis == y.axis and x.size == y.size:
                        return VecAnn(x.axis, x.size, x.paths | y.paths)
                    self.tainted |= x.paths | y.paths
                    return None
                self.tainted |= x.paths  # met an unknown tensor
                return None
        if a == _UNIFORM and b == _UNIFORM:
            return _UNIFORM
        return None


# ---------------------------------------------------------------------------
# the interpreter
# ---------------------------------------------------------------------------

_UNARY = {
    'convert_element_type', 'exp', 'log', 'tanh', 'logistic', 'rsqrt',
    'sqrt', 'neg', 'sign', 'abs', 'integer_pow', 'erf', 'floor', 'ceil',
    'round', 'is_finite', 'stop_gradient', 'copy', 'real', 'imag',
    'reduce_precision', 'cbrt', 'exp2', 'log1p', 'expm1', 'square', 'tan',
    'sin', 'cos', 'asin', 'acos', 'atan', 'sinh', 'cosh', 'asinh', 'acosh',
    'atanh',
}
_BINARY = {
    'add', 'sub', 'mul', 'div', 'max', 'min', 'pow', 'rem', 'atan2',
    'and', 'or', 'xor', 'eq', 'ne', 'ge', 'gt', 'le', 'lt', 'nextafter',
}


def _subjaxprs(params: dict):
    for v in params.values():
        if isinstance(v, jax.extend.core.ClosedJaxpr):
            yield v
        elif isinstance(v, (list, tuple)):
            for item in v:
                if isinstance(item, jax.extend.core.ClosedJaxpr):
                    yield item


def analyze_jaxpr(closed_jaxpr, param_paths: Sequence[Optional[Path]]
                  ) -> List[Space]:
    """Run the channel interpreter over a closed jaxpr.

    ``param_paths[i]`` names the i-th invar (None for non-param inputs such
    as the image batch).
    """
    spaces = _SpaceSet()
    interp = _Interp(spaces)

    env: Dict[Any, Any] = {}          # jaxpr Var -> annotation
    provenance: Dict[Any, Path] = {}  # jaxpr Var -> direct param path

    def read(atom):
        if not hasattr(atom, 'aval') or type(atom).__name__ == 'Literal':
            val = getattr(atom, 'val', None)
            return _UNIFORM if np.ndim(val) == 0 else None
        return env.get(atom)

    def read_prov(atom):
        if type(atom).__name__ == 'Literal':
            return None
        return provenance.get(atom)

    def shape(atom):
        return atom.aval.shape

    jaxpr = closed_jaxpr.jaxpr
    for var, path in zip(jaxpr.invars, param_paths):
        if path is not None:
            arr_shape = var.aval.shape
            provenance[var] = path
            if len(arr_shape) == 1 and arr_shape[0] > 1:
                env[var] = VecAnn(axis=0, size=arr_shape[0],
                                  paths=frozenset([path]))
            elif len(arr_shape) == 0:
                env[var] = _UNIFORM
            else:
                env[var] = None
        else:
            env[var] = None
    for var in jaxpr.constvars:
        env[var] = None

    def run(jxp):
        for eqn in jxp.eqns:
            _eqn(eqn)

    def _eqn(eqn):
        name = eqn.primitive.name
        outs = eqn.outvars
        ins = eqn.invars

        def setout(ann, i=0):
            env[outs[i]] = ann

        if name == 'conv_general_dilated':
            _conv(eqn)
        elif name in _BINARY and len(ins) == 2:
            setout(interp._combine(read(ins[0]), read(ins[1]),
                                   shape(outs[0])))
        elif name == 'clamp':
            # clamp(min, x, max): the VALUE operand is ins[1]
            ann = read(ins[1])
            for other in (ins[0], ins[2]):
                ann = interp._combine(ann, read(other), shape(outs[0]))
            setout(ann)
        elif name == 'select_n':
            ann = read(ins[1])
            for other in ins[2:]:
                ann = interp._combine(ann, read(other), shape(outs[0]))
            pred = read(ins[0])
            if isinstance(pred, (ChanAnn, VecAnn)):
                interp._freeze_ann(pred)
            setout(ann)
        elif name in _UNARY:
            ann = read(ins[0])
            setout(ann)
            if name == 'convert_element_type' and read_prov(ins[0]) is not None:
                provenance[outs[0]] = read_prov(ins[0])
        elif name == 'broadcast_in_dim':
            _broadcast(eqn)
        elif name == 'reshape':
            _reshape(eqn)
        elif name == 'transpose':
            _transpose(eqn)
        elif name == 'concatenate':
            _concat(eqn)
        elif name == 'reduce_window_max' or name == 'reduce_window_sum':
            _reduce_window(eqn)
        elif name in ('reduce_sum', 'reduce_max', 'reduce_min', 'reduce_prod',
                      'reduce_mean', 'reduce_and', 'reduce_or'):
            _reduce(eqn)
        elif name == 'pad':
            _pad(eqn)
        elif name == 'squeeze':
            _squeeze(eqn)
        elif name == 'rev':
            ann = read(ins[0])
            if isinstance(ann, ChanAnn) and ann.axis in eqn.params['dimensions']:
                interp._freeze_ann(ann)
                ann = None
            setout(ann)
        elif name == 'gather':
            _gather(eqn)
        elif name == 'slice':
            _slice(eqn)
        elif name in ('dynamic_slice', 'dynamic_update_slice',
                      'scatter', 'scatter_add'):
            for a in ins:
                ann = read(a)
                if isinstance(ann, (ChanAnn, VecAnn)):
                    interp._freeze_ann(ann)
            for i in range(len(outs)):
                setout(None, i)
        else:
            subs = list(_subjaxprs(eqn.params))
            # Inline only true call-like primitives: every sub invar must have
            # the SAME aval shape as the outer atom it binds.  Primitives like
            # lax.scan satisfy the arity check but rank-reduce their xs invars
            # per iteration, so a copied ChanAnn/VecAnn axis would be off by
            # one — silently corrupting the analysis instead of degrading to
            # not-pruned.  Shape mismatch → fall through to the freeze branch.
            if (len(subs) == 1 and len(subs[0].jaxpr.invars) == len(ins)
                    and all(getattr(getattr(a, 'aval', None), 'shape', None)
                            == v.aval.shape
                            for v, a in zip(subs[0].jaxpr.invars, ins))):
                sub = subs[0]
                for var, atom in zip(sub.jaxpr.invars, ins):
                    env[var] = read(atom)
                    p = read_prov(atom)
                    if p is not None:
                        provenance[var] = p
                for var in sub.jaxpr.constvars:
                    env[var] = None
                run(sub.jaxpr)
                for i, var in enumerate(sub.jaxpr.outvars):
                    ann = read(var)
                    setout(ann, i)
                    p = read_prov(var) if type(var).__name__ != 'Literal' else None
                    if p is not None:
                        provenance[outs[i]] = p
            else:
                # unknown primitive: freeze everything it touches
                for a in ins:
                    ann = read(a)
                    if isinstance(ann, (ChanAnn, VecAnn)):
                        interp._freeze_ann(ann)
                for i in range(len(outs)):
                    setout(None, i)

    def _conv(eqn):
        lhs, rhs = eqn.invars
        dn = eqn.params['dimension_numbers']
        lhs_feat = dn.lhs_spec[1]
        rhs_out = dn.rhs_spec[0]
        rhs_in = dn.rhs_spec[1]
        out_feat = dn.out_spec[1]
        groups = eqn.params['feature_group_count']
        cin = shape(lhs)[lhs_feat]
        cout = shape(eqn.outvars[0])[out_feat]
        kernel_path = read_prov(rhs)
        lhs_ann = read(lhs)

        if kernel_path is None:
            # computed kernel: nothing we can slice
            if isinstance(lhs_ann, (ChanAnn, VecAnn)):
                interp._freeze_ann(lhs_ann)
            env[eqn.outvars[0]] = None
            return

        if isinstance(lhs_ann, ChanAnn) and lhs_ann.axis != lhs_feat:
            interp._freeze_ann(lhs_ann)
            lhs_ann = None
        if isinstance(lhs_ann, VecAnn):
            interp.tainted |= lhs_ann.paths
            lhs_ann = None

        if groups == 1:
            if isinstance(lhs_ann, ChanAnn):
                off = 0
                for sid, size in lhs_ann.segments:
                    spaces.add_member(sid, Member(path=kernel_path,
                                                  axis=rhs_in, offset=off,
                                                  role='consumer'))
                    off += size
            sid = spaces.fresh(cout)
            spaces.add_member(sid, Member(path=kernel_path, axis=rhs_out,
                                          offset=0, role='producer'))
            env[eqn.outvars[0]] = ChanAnn(out_feat, ((sid, cout),))
        elif groups == cin and cout == cin:
            # depthwise, channel multiplier 1: channels flow through
            if isinstance(lhs_ann, ChanAnn):
                off = 0
                for sid, size in lhs_ann.segments:
                    spaces.add_member(sid, Member(path=kernel_path,
                                                  axis=rhs_out, offset=off,
                                                  role='depthwise'))
                    off += size
                env[eqn.outvars[0]] = ChanAnn(out_feat, lhs_ann.segments)
            else:
                # input channels untracked (e.g. after a channel split):
                # the kernel still owns a space, but a frozen one
                sid = spaces.fresh(cout, frozen=True)
                spaces.add_member(sid, Member(path=kernel_path, axis=rhs_out,
                                              offset=0, role='depthwise'))
                env[eqn.outvars[0]] = ChanAnn(out_feat, ((sid, cout),))
        else:
            # other grouped convs (ResNeXt etc.): group g reads channel block
            # g of the input and writes block g of the output — pruning would
            # have to keep group sizes equal; freeze for safety.
            if isinstance(lhs_ann, ChanAnn):
                interp._freeze_ann(lhs_ann)
            sid = spaces.fresh(cout, frozen=True)
            spaces.add_member(sid, Member(path=kernel_path, axis=rhs_out,
                                          offset=0, role='producer'))
            env[eqn.outvars[0]] = ChanAnn(out_feat, ((sid, cout),))

    def _broadcast(eqn):
        (inv,) = eqn.invars
        ann = read(inv)
        bdims = eqn.params['broadcast_dimensions']
        in_shape = shape(inv)
        if ann == _UNIFORM or (ann is None and all(d == 1 for d in in_shape)):
            env[eqn.outvars[0]] = _UNIFORM
            return
        if isinstance(ann, (ChanAnn, VecAnn)):
            new_axis = bdims[ann.axis]
            env[eqn.outvars[0]] = dataclasses.replace(ann, axis=new_axis)
            return
        env[eqn.outvars[0]] = None

    def _moved_axis(in_shape, out_shape, axis):
        """Where an intact axis lands after a reshape, else None."""
        lead = int(np.prod(in_shape[:axis], dtype=np.int64))
        trail = int(np.prod(in_shape[axis + 1:], dtype=np.int64))
        size = in_shape[axis]
        for b in range(len(out_shape)):
            if (out_shape[b] == size
                    and int(np.prod(out_shape[:b], dtype=np.int64)) == lead
                    and int(np.prod(out_shape[b + 1:], dtype=np.int64)) == trail):
                return b
        return None

    def _reshape(eqn):
        (inv,) = eqn.invars
        ann = read(inv)
        if ann is None or ann == _UNIFORM:
            env[eqn.outvars[0]] = ann
            return
        b = _moved_axis(shape(inv), shape(eqn.outvars[0]), ann.axis)
        if b is None:
            interp._freeze_ann(ann)
            env[eqn.outvars[0]] = None
        else:
            env[eqn.outvars[0]] = dataclasses.replace(ann, axis=b)

    def _squeeze(eqn):
        (inv,) = eqn.invars
        ann = read(inv)
        if isinstance(ann, (ChanAnn, VecAnn)):
            dims = eqn.params['dimensions']
            if ann.axis in dims:
                interp._freeze_ann(ann)
                env[eqn.outvars[0]] = None
            else:
                new_axis = ann.axis - sum(1 for d in dims if d < ann.axis)
                env[eqn.outvars[0]] = dataclasses.replace(ann, axis=new_axis)
        else:
            env[eqn.outvars[0]] = ann

    def _transpose(eqn):
        (inv,) = eqn.invars
        ann = read(inv)
        if isinstance(ann, (ChanAnn, VecAnn)):
            perm = eqn.params['permutation']
            new_axis = list(perm).index(ann.axis)
            env[eqn.outvars[0]] = dataclasses.replace(ann, axis=new_axis)
        else:
            env[eqn.outvars[0]] = ann

    def _concat(eqn):
        dim = eqn.params['dimension']
        anns = [read(a) for a in eqn.invars]
        chan = [a for a in anns if isinstance(a, ChanAnn)]
        if not chan:
            env[eqn.outvars[0]] = None
            return
        axis = chan[0].axis
        if axis == dim:
            segments: List[Tuple[int, int]] = []
            ok = True
            for a, atom in zip(anns, eqn.invars):
                if isinstance(a, ChanAnn) and a.axis == dim:
                    segments.extend(a.segments)
                elif a is None or a == _UNIFORM or isinstance(a, VecAnn):
                    # unknown chunk: anonymous frozen space keeps offsets right
                    size = shape(atom)[dim]
                    sid = spaces.fresh(size, frozen=True)
                    segments.append((sid, size))
                    if isinstance(a, VecAnn):
                        interp.tainted |= a.paths
                else:
                    ok = False
            if ok:
                env[eqn.outvars[0]] = ChanAnn(dim, tuple(segments))
                return
            for a in anns:
                if isinstance(a, (ChanAnn, VecAnn)):
                    interp._freeze_ann(a)
            env[eqn.outvars[0]] = None
        else:
            # concat along another axis: all chunks must share the spaces
            out = anns[0]
            for a in anns[1:]:
                out = interp._combine(out, a, shape(eqn.outvars[0]))
            env[eqn.outvars[0]] = out

    def _reduce_window(eqn):
        inv = eqn.invars[0]
        ann = read(inv)
        if isinstance(ann, ChanAnn):
            wd = eqn.params['window_dimensions']
            pads = eqn.params['padding']
            if wd[ann.axis] != 1 or pads[ann.axis] != (0, 0):
                interp._freeze_ann(ann)
                ann = None
        env[eqn.outvars[0]] = ann

    def _reduce(eqn):
        inv = eqn.invars[0]
        ann = read(inv)
        axes = eqn.params['axes']
        if isinstance(ann, (ChanAnn, VecAnn)):
            if ann.axis in axes:
                interp._freeze_ann(ann)
                ann = None
            else:
                new_axis = ann.axis - sum(1 for d in axes if d < ann.axis)
                ann = dataclasses.replace(ann, axis=new_axis)
        env[eqn.outvars[0]] = ann

    def _gather(eqn):
        """Spatial gathers (e.g. jax.image.resize nearest) keep channel
        annotations when the channel axis is fully sliced, not collapsed,
        and not indexed; anything else freezes."""
        operand = eqn.invars[0]
        ann = read(operand)
        idx_ann = read(eqn.invars[1])
        if isinstance(idx_ann, (ChanAnn, VecAnn)):
            interp._freeze_ann(idx_ann)
        if not isinstance(ann, (ChanAnn, VecAnn)):
            env[eqn.outvars[0]] = None
            return
        dn = eqn.params['dimension_numbers']
        slice_sizes = eqn.params['slice_sizes']
        c = ann.axis
        op_shape = shape(operand)
        ok = (slice_sizes[c] == op_shape[c]
              and c not in dn.collapsed_slice_dims
              and c not in dn.start_index_map)
        if not ok:
            interp._freeze_ann(ann)
            env[eqn.outvars[0]] = None
            return
        kept = [d for d in range(len(op_shape))
                if d not in dn.collapsed_slice_dims]
        out_axis = dn.offset_dims[kept.index(c)]
        env[eqn.outvars[0]] = dataclasses.replace(ann, axis=out_axis)

    def _slice(eqn):
        """Static slices keep annotations when the channel axis is taken
        whole (stride 1, full range)."""
        (inv,) = eqn.invars
        ann = read(inv)
        if not isinstance(ann, (ChanAnn, VecAnn)):
            env[eqn.outvars[0]] = ann if ann == _UNIFORM else None
            return
        c = ann.axis
        start = eqn.params['start_indices'][c]
        limit = eqn.params['limit_indices'][c]
        strides = eqn.params['strides']
        stride = 1 if strides is None else strides[c]
        if start == 0 and limit == shape(inv)[c] and stride == 1:
            env[eqn.outvars[0]] = ann
        else:
            interp._freeze_ann(ann)
            env[eqn.outvars[0]] = None

    def _pad(eqn):
        inv = eqn.invars[0]
        ann = read(inv)
        if isinstance(ann, ChanAnn):
            cfg = eqn.params['padding_config']
            if cfg[ann.axis] != (0, 0, 0):
                interp._freeze_ann(ann)
                ann = None
        env[eqn.outvars[0]] = ann

    run(jaxpr)

    # model outputs are user-visible: freeze any space still annotated there
    for var in jaxpr.outvars:
        if type(var).__name__ != 'Literal':
            ann = env.get(var)
            if isinstance(ann, ChanAnn):
                interp._freeze_ann(ann)

    # resolve union-find roots into Space objects
    out: List[Space] = []
    for sid in range(len(spaces.parent)):
        if spaces.find(sid) != sid:
            continue
        members = tuple(spaces.members[sid])
        if not members:
            continue
        # vector params that leaked into unknown contexts make the whole
        # space unsafe to slice
        frozen = spaces.frozen[sid] or any(
            m.path in interp.tainted for m in members)
        out.append(Space(width=spaces.width[sid], members=members,
                         frozen=frozen))
    return out


def _key_to_str(k) -> str:
    if hasattr(k, 'key'):
        return str(k.key)
    if hasattr(k, 'idx'):
        return str(k.idx)
    return str(k)


def analyze_module(module, variables, input_shape,
                   dtype=np.float32) -> List[Space]:
    """Channel spaces of ``module.apply(variables, x, train=False)``.

    ``input_shape`` includes the batch dim, e.g. ``(1, 300, 300, 3)``.
    """
    import jax.numpy as jnp

    x = jnp.zeros(input_shape, dtype)
    closed = jax.make_jaxpr(
        lambda v, xx: module.apply(v, xx, train=False))(variables, x)

    leaves_with_paths = jax.tree_util.tree_flatten_with_path(variables)[0]
    param_paths: List[Optional[Path]] = [
        tuple(_key_to_str(k) for k in path) for path, _ in leaves_with_paths]
    n_x = len(jax.tree_util.tree_leaves(x))
    param_paths.extend([None] * n_x)
    assert len(param_paths) == len(closed.jaxpr.invars), (
        len(param_paths), len(closed.jaxpr.invars))
    return analyze_jaxpr(closed, param_paths)
