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


def shard_batch(mesh: Mesh, batch):
    """Place a host-local pytree of arrays as data-sharded global arrays."""
    sharding = batch_sharding(mesh)

    def place(x):
        spec = P(DATA_AXIS, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    del sharding
    return jax.tree_util.tree_map(place, batch)


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
