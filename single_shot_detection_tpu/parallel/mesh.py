"""Device mesh + sharding layout.

Replaces the reference's entire distributed stack (SURVEY.md §2.8): NCCL
process groups (env.py:62-65), apex DDP gradient hooks (init.py:80-86),
DistributedSampler (data_builder.py:53-54) and sync-BN (init.py:85) all
collapse into ONE concept — a ``jax.sharding.Mesh`` with the batch sharded
over the ``data`` axis:

  * gradient all-reduce: inserted by XLA because the scalar loss sums over a
    sharded batch (compiled to ICI collectives, no hooks);
  * sync-BN: batch-norm statistics are means over the *global* batch under
    GSPMD — stronger than apex sync-BN, for free;
  * data sharding: each host feeds its slice via
    ``jax.make_array_from_process_local_data``.

A ``model`` axis is reserved for spatial/tensor partitioning of very large
inputs (SURVEY.md §5 — not needed for parity, the mesh is ready for it).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def create_mesh(n_data: Optional[int] = None, n_model: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_key(path) -> str:
    """Last dict key on a tree path ('' for non-dict leaves)."""
    for entry in reversed(path):
        key = getattr(entry, 'key', None)
        if key is not None:
            return str(key)
    return ''


def _data_spec(x, axis: int, spatial: bool = False) -> P:
    spec = [None] * np.ndim(x)
    spec[axis] = DATA_AXIS
    if spatial and np.ndim(x) >= axis + 4:
        # image leaves ([B, H, W, C], or [k, B, H, W, C] fused) — shard the
        # height axis over 'model'; GSPMD inserts the conv halo exchanges.
        spec[axis + 1] = MODEL_AXIS
    return P(*spec)


def batch_shardings(mesh: Mesh, batch, axis: int = 0,
                    spatial: bool = False):
    """The NamedSharding tree :func:`shard_batch` places ``batch`` with
    (leaves may be arrays or ShapeDtypeStructs).  Exposed so on-device
    batch producers (data/device_cache.py gathers) can pin their
    ``out_shardings`` to EXACTLY the transfer path's placement — a
    different (if semantically equal) sharding would recompile the train
    step into a second executable with different fusion/reduction order."""
    def spec(path, x):
        sp = spatial and _leaf_key(path) == 'image'
        return NamedSharding(mesh, _data_spec(x, axis, sp))

    return jax.tree_util.tree_map_with_path(spec, batch)


def shard_batch(mesh: Mesh, batch, axis: int = 0, spatial: bool = False):
    """Place a host-local pytree of arrays as data-sharded global arrays
    (``axis`` = the batch dimension; fused [k, B, ...] chunks use axis=1).
    ``spatial``: additionally shard image heights over the ``model`` axis
    (engine ``train.spatial_sharding`` — the very-large-input extension,
    SURVEY.md §5).  Only leaves NAMED ``image`` qualify — rank alone would
    mis-shard future image-shaped auxiliaries (weight maps etc.)."""
    shardings = batch_shardings(mesh, batch, axis, spatial)
    return jax.tree_util.tree_map(jax.device_put, batch, shardings)


def make_global_batch(mesh: Mesh, batch, process_count: int = 1,
                      axis: int = 0, spatial: bool = False):
    """Assemble per-host batches into data-sharded GLOBAL arrays.

    Single-process: a plain ``device_put`` with the batch axis sharded.
    Multi-host: ``jax.make_array_from_process_local_data`` — each host
    contributes its loader's slice; the global batch (= per-host batch ×
    process_count) is the concatenation in process order.  This replaces the
    reference's DistributedSampler + DDP input scatter (data_builder.py:53-54).
    """
    if process_count <= 1:
        return shard_batch(mesh, batch, axis, spatial)

    def place(path, x):
        sp = spatial and _leaf_key(path) == 'image'
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, _data_spec(x, axis, sp)), np.asarray(x))

    return jax.tree_util.tree_map_with_path(place, batch)


def host_local_rows(array) -> np.ndarray:
    """The batch rows this host contributed, as numpy (in global row order).

    For a fully-addressable (single-host) array this is the whole array;
    under multi-host it concatenates the addressable shards of the
    data-sharded leading axis.
    """
    if array.is_fully_addressable:
        return np.asarray(jax.device_get(array))
    shards = sorted(array.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def all_gather_host(tree, process_count: int = 1):
    """All-gather a pytree of per-host numpy arrays across processes,
    concatenating along axis 0 in process order (identity when
    single-process).  Used to assemble global eval predictions/GT for the
    host-side mAP metric."""
    if process_count <= 1:
        return tree
    from jax.experimental import multihost_utils

    def gather(x):
        stacked = multihost_utils.process_allgather(np.asarray(x))
        return stacked.reshape((-1,) + stacked.shape[2:])

    return jax.tree_util.tree_map(gather, tree)


def _largest_divisible_axis(shape, n: int, taken=()) -> Optional[int]:
    """The largest axis of ``shape`` divisible by ``n`` (excluding ``taken``
    indices), or None — the ZeRO-1 axis-selection policy shared by
    :func:`zero_state_sharding` and :func:`tensor_state_sharding`."""
    best = None
    for ax, d in enumerate(shape):
        if ax in taken or d <= 1 or d % n:
            continue
        if best is None or d > shape[best]:
            best = ax
    return best


def zero_state_sharding(mesh: Mesh, state, min_size: Optional[int] = None):
    """ZeRO-1-style placement tree for a TrainState (beyond-parity).

    Params and batch statistics stay replicated (every device needs them
    each forward pass anyway); the optimizer state and the EMA shadow —
    which are only *read and written elementwise* once per step — are
    sharded over the ``data`` axis, cutting their per-device HBM footprint
    by ~n_data.  With Adam-family optimizers (2 moments) plus gradient
    accumulation and EMA, that state is 3-4x the params — the dominant HBM
    resident after activations.

    Per leaf we shard the largest dimension divisible by the data-axis
    size (conv kernels shard their channel axis, biases their only axis);
    leaves smaller than ``min_size`` elements or with no divisible
    dimension stay replicated — the wrong choice there costs more in
    collective latency than it saves in HBM.

    Returns a pytree of ``NamedSharding`` with the same structure as
    ``state`` — feed it to ``jax.device_put`` and to the train step's
    ``state_sharding`` pin (train/step.py) so GSPMD keeps the layout
    stable across donated steps instead of re-deciding it per compile.
    """
    tree_map = jax.tree_util.tree_map
    repl = NamedSharding(mesh, P())
    n = mesh.shape[DATA_AXIS]
    if n <= 1:
        return tree_map(lambda _: repl, state)
    if min_size is None:
        min_size = 8 * n

    def shard_leaf(x):
        shape = tuple(np.shape(x))
        if int(np.prod(shape or (1,))) < min_size:
            return repl
        best = _largest_divisible_axis(shape, n)
        if best is None:
            return repl
        spec = [None] * len(shape)
        spec[best] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return state.replace(
        step=repl,
        lr_scale=repl,
        params=tree_map(lambda _: repl, state.params),
        batch_stats=tree_map(lambda _: repl, state.batch_stats),
        opt_state=tree_map(shard_leaf, state.opt_state),
        ema_params=tree_map(shard_leaf, state.ema_params))


def tensor_state_sharding(mesh: Mesh, state, zero: bool = False):
    """Megatron-style tensor (channel) parallelism over the ``model`` axis
    (beyond-parity — the reference has no TP story, SURVEY.md §2.8).

    Shards the LAST axis of every per-channel leaf over ``model``: conv
    kernels ``[kh, kw, cin, cout]`` split their output channels, biases /
    BN scale+bias / running statistics ``[C]`` split C, and the optimizer
    moments + EMA shadow follow their parameters.  Leaves whose last axis
    doesn't divide the model-axis size (e.g. the detection heads, whose
    cout = num_anchors x classes) stay replicated — GSPMD inserts the
    all-gather exactly where full channels are first needed.

    Under GSPMD this is all that tensor parallelism *is* on TPU: annotate
    the parameter layout, let the partitioner propagate channel-sharded
    activations through conv/BN/relu (each model shard computes only its
    cout slice of every conv, holds 1/n of the params+opt state) and place
    collectives where consumers disagree.  There are no hand-written
    all-reduces to maintain — the idiomatic inverse of Megatron's explicit
    ColumnParallel/RowParallel modules.

    ``zero=True`` composes ZeRO-1 on top (the combined
    ``train.tensor_sharding`` + ``train.zero_sharding`` engine layout):
    optimizer-state and EMA leaves additionally shard their largest
    *remaining* axis over ``data``, as in :func:`zero_state_sharding`.

    Returns a pytree of ``NamedSharding`` matching ``state`` — feed it to
    ``jax.device_put`` and the train step's ``state_sharding`` pin.
    """
    tree_map = jax.tree_util.tree_map
    repl = NamedSharding(mesh, P())
    n_model = mesh.shape[MODEL_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    zero_min = 8 * n_data

    def model_spec(x) -> list:
        shape = tuple(np.shape(x))
        spec = [None] * len(shape)
        if (n_model > 1 and shape and shape[-1] > 1
                and shape[-1] % n_model == 0):
            spec[-1] = MODEL_AXIS
        return spec

    def param_leaf(x):
        spec = model_spec(x)
        if not any(spec):
            return repl
        return NamedSharding(mesh, P(*spec))

    def opt_leaf(x):
        spec = model_spec(x)
        shape = tuple(np.shape(x))
        if (zero and n_data > 1
                and int(np.prod(shape or (1,))) >= zero_min):
            taken = tuple(ax for ax, s in enumerate(spec) if s is not None)
            best = _largest_divisible_axis(shape, n_data, taken)
            if best is not None:
                spec[best] = DATA_AXIS
        if not any(spec):
            return repl
        return NamedSharding(mesh, P(*spec))

    return state.replace(
        step=repl,
        lr_scale=repl,
        params=tree_map(param_leaf, state.params),
        batch_stats=tree_map(param_leaf, state.batch_stats),
        opt_state=tree_map(opt_leaf, state.opt_state),
        ema_params=tree_map(opt_leaf, state.ema_params))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bootstrap (replaces env.py:55-79's NCCL TCP rendezvous).

    No-op when single-process; otherwise delegates to
    ``jax.distributed.initialize`` which wires ICI/DCN transport.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
