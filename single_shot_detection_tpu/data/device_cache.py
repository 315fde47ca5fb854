"""HBM-resident staged dataset: epochs after the first never touch the host.

TPU-first design (no reference analog — the torch DataLoader re-ships every
batch over PCIe each epoch, data_builder.py:44-87): staged pixels are a pure
function of (dataset, staging_size, colorspace) — all augmentation runs
on-device AFTER staging (data/transforms.py) — so the whole staged dataset
is cacheable.  A detection dataset at yuv420 staging is small by HBM
standards (VOC-size ~5.7k images x 135 KB = 0.77 GB on a 16 GB v5e), so
after one fill epoch the entire dataset lives on device and every later
epoch assembles its batches with an on-device gather: zero host decode,
zero host->device pixel transfer.  On a relay-attached TPU (~30-70 MB/s
link, docs/PERF.md) this moves e2e training from transfer-bound to
device-step-bound.

Batch composition is BITWISE identical to the host loader's: epoch order
comes from the same ``Loader._indices()`` permutation (seed + epoch), so
cached and uncached runs — and resumed runs with a cold cache — produce
identical training streams (tests/test_device_cache.py).

Fill happens opportunistically during the first trained epoch (the batches
are observed on their way to the step); with ``drop_last`` the loader
skips up to B-1 samples per epoch, so ``finalize`` tops up the few unseen
rows directly before uploading.
"""

from __future__ import annotations

import logging
from typing import Iterator, Optional, Tuple

import numpy as np


class DeviceDatasetCache:
    """Cache of staged train records, host-filled then device-resident.

    Usage (train/engine.py):
      * epoch with cold cache: ``observe(batch)`` each loader batch,
        ``finalize(loader)`` at epoch end;
      * later epochs: ``epoch_batches(loader, epoch, shard_fn, fused_k)``
        yields ``(kind, device_batch)`` exactly like the loader+transfer
        path, but from HBM.
    """

    def __init__(self, loader, max_bytes: int = 4 << 30,
                 process_count: int = 1, process_index: int = 0):
        n = len(loader.dataset)
        probe = self._record_shapes(loader)
        img_shape, nbytes = probe
        total = n * nbytes
        # HBM footprint + budget, exposed so the eval replay cache
        # (engine.evaluate) can charge itself against the SAME budget
        self.total_bytes = total
        self.max_bytes = max_bytes
        self.ok = total <= max_bytes
        if not self.ok:
            logging.warning(
                f'WW train.device_cache: staged dataset needs {total / 2**30:.2f}'
                f' GiB > budget {max_bytes / 2**30:.2f} GiB '
                f"(raise train.device_cache['max_bytes'] to override) — "
                f'falling back to host streaming')
            return
        self.n = n
        self.process_count = process_count
        self.process_index = process_index
        # multi-host: the cache is ONE global array row-sharded over the
        # data axis; each host stages only its contiguous block (process
        # order — exactly the rows make_array_from_process_local_data
        # expects from it).  Rows a host never sees in its own loader
        # shard are topped up directly at finalize.  Gathers then use
        # GLOBAL dataset indices; GSPMD moves rows between hosts over ICI.
        self._row_lo = 0
        n_local = n
        if process_count > 1:
            n_local = (n + (-n) % process_count) // process_count
            self._row_lo = process_index * n_local
        self.n_local = n_local
        self._cache_stride = n_local  # finalize adds the block padding
        self.images = np.zeros((n_local,) + img_shape, np.uint8)
        self.boxes = np.zeros((n_local, loader.max_gt, 7), np.float32)
        self.mask = np.zeros((n_local, loader.max_gt), bool)
        self.seen = np.zeros((n_local,), bool)
        # block rows past the dataset end (wrap padding) have no content
        self.seen[max(0, n - self._row_lo):] = True
        self.device = None  # set by finalize()
        self._gathers = {}
        self._sharding_builder = None
        logging.info(f'II device cache: reserving '
                     f'{n_local * nbytes / 2**30:.2f} GiB host staging for '
                     f'{n_local} records {img_shape}')

    @staticmethod
    def _record_shapes(loader) -> Tuple[tuple, int]:
        s = loader.staging_size
        if loader.staging_colorspace == 'yuv420':
            img_shape: tuple = (s[0] * s[1] * 3 // 2,)
        else:
            img_shape = (s[1], s[0], 3)
        nbytes = (int(np.prod(img_shape))          # uint8 pixels
                  + loader.max_gt * 7 * 4          # boxes f32
                  + loader.max_gt)                 # mask bool
        return img_shape, nbytes

    @property
    def ready(self) -> bool:
        return self.ok and self.device is not None

    def observe(self, batch: dict) -> None:
        """Record a host loader batch during the fill epoch (rows keyed by
        dataset index via ``ids``; padding rows carry -1)."""
        if not self.ok or self.device is not None:
            return
        ids = np.asarray(batch['ids'])
        # multi-host: keep only the rows of THIS host's block, at local
        # offsets (a host's loader shard is a shuffled subset — only ~1/P
        # of it lands in its block; the rest top up at finalize)
        valid = (ids >= self._row_lo) & (ids < self._row_lo + self.n_local)
        idx = ids[valid] - self._row_lo
        self.images[idx] = np.asarray(batch['image'])[valid]
        self.boxes[idx] = np.asarray(batch['boxes'])[valid]
        self.mask[idx] = np.asarray(batch['box_mask'])[valid]
        self.seen[idx] = True

    def finalize(self, loader, shard_fn, sharding_builder=None,
                 row_divisor: int = 1) -> None:
        """Top up rows the drop_last epoch never yielded, then upload the
        whole staged dataset to device (``shard_fn`` places it like any
        batch — row-sharded over the data axis on a mesh).

        ``sharding_builder(abstract_batch, axis) -> sharding tree`` pins the
        gather outputs to EXACTLY the placement the transfer path
        (``engine._shard``) produces — without it the gathered batch would
        carry a different (if equivalent) sharding and the jitted train
        step would recompile into a second executable whose different
        fusion/reduction order breaks bitwise equivalence
        (tests/test_device_cache.py)."""
        if not self.ok or self.device is not None:
            return
        missing = np.flatnonzero(~self.seen) + self._row_lo
        if len(missing):
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=loader.num_workers) as pool:
                for start in range(0, len(missing), loader.batch_size):
                    idxs = missing[start:start + loader.batch_size]
                    self.observe(loader._make_batch(idxs, pool))
        assert bool(self.seen.all())
        host = {'image': self.images, 'boxes': self.boxes,
                'box_mask': self.mask}
        # the row axis shards over the data mesh axis; each host's block
        # pads to its LOCAL device count so the global concatenation (in
        # process order — make_array_from_process_local_data's contract)
        # is divisible.  Gather indices never reference the zero rows:
        # dataset index -> cached row via _cache_stride block arithmetic.
        local_div = max(row_divisor, 1)
        if self.process_count > 1:
            if row_divisor % self.process_count:
                raise ValueError(
                    f'device_cache: data-axis size {row_divisor} must be '
                    f'divisible by process_count {self.process_count}')
            local_div = row_divisor // self.process_count
        pad = (-self.n_local) % local_div
        if pad:
            host = {k: np.concatenate([v, np.zeros((pad,) + v.shape[1:],
                                                   v.dtype)])
                    for k, v in host.items()}
        self._cache_stride = self.n_local + pad
        self.device = shard_fn(host)
        # free the host staging copies — the device is the source of truth
        self.images = self.boxes = self.mask = None
        self._sharding_builder = sharding_builder
        self._gathers = {}
        logging.info(f'===> device cache ready: {self.n} records in HBM — '
                     f'later epochs run host-free')

    def _gather_for(self, idx_ndim: int):
        """Jitted row gather for ``idx`` of rank 1 ([B] single batches) or
        2 ([k, B] fused chunks), output placed like the transfer path."""
        if idx_ndim not in self._gathers:
            import jax
            import jax.numpy as jnp

            def gather(data, idx):
                return jax.tree_util.tree_map(lambda a: a[idx], data)

            out_shardings = None
            if self._sharding_builder is not None:
                idx_abs = jax.ShapeDtypeStruct((2,) * idx_ndim, jnp.int32)
                out_abs = jax.eval_shape(gather, self.device, idx_abs)
                out_shardings = self._sharding_builder(out_abs,
                                                       axis=idx_ndim - 1)
            self._gathers[idx_ndim] = jax.jit(gather,
                                              out_shardings=out_shardings)
        return self._gathers[idx_ndim]

    def epoch_batches(self, loader, epoch: int, fused_k: int = 1,
                      num_batches: Optional[int] = None) -> Iterator[tuple]:
        """Yield ``(kind, device_batch)`` for one epoch, mirroring the
        loader+``_train_batches`` stream exactly: same (seed + epoch)
        permutation, same drop_last truncation, same fused chunking,
        same ``num_batches`` cap.

        Multi-host: the yielded batch is the GLOBAL batch — index row b is
        the process-order concatenation of every host's streaming batch b
        (``make_global_batch``'s layout), gathered from the row-sharded
        global cache in one SPMD program.  Every host computes the same
        index arrays (the permutation is (seed + epoch)-deterministic), so
        the numpy indices act as replicated jit inputs."""
        import jax

        loader.epoch = epoch  # _indices reads it (same as the host path)
        B = loader.batch_size
        P = loader.process_count
        if P > 1:
            g = loader._global_order()
            shards = np.stack([g[p::P] for p in range(P)])  # [P, m]
            nb = shards.shape[1] // B  # drop_last (train loaders)
            if num_batches is not None:
                nb = min(nb, num_batches)
            order = (shards[:, :nb * B].reshape(P, nb, B)
                     .transpose(1, 0, 2).reshape(nb, P * B))
        else:
            order = loader._indices()
            nb = len(order) // B
            if num_batches is not None:
                nb = min(nb, num_batches)
            order = order[:nb * B].reshape(nb, B)
        # dataset index -> cached row (hosts' blocks concatenate with
        # per-block padding; identity when single-process)
        order = ((order // self.n_local) * self._cache_stride
                 + order % self.n_local)
        pos = 0
        while pos < nb:
            if fused_k > 1 and pos + fused_k <= nb:
                idx = jax.numpy.asarray(order[pos:pos + fused_k],
                                        dtype=jax.numpy.int32)  # [k, B]
                yield 'fused', self._gather_for(2)(self.device, idx)
                pos += fused_k
            else:
                idx = jax.numpy.asarray(order[pos],
                                        dtype=jax.numpy.int32)  # [B]
                yield 'single', self._gather_for(1)(self.device, idx)
                pos += 1


def make_device_cache(loader, cfg, process_count: int = 1,
                      process_index: int = 0) -> Optional[DeviceDatasetCache]:
    """Build from the ``train.device_cache`` config knob: ``True`` or
    ``{'max_bytes': int}``; returns None when disabled/over-budget."""
    if not cfg:
        return None
    opts = dict(cfg) if isinstance(cfg, dict) else {}
    cache = DeviceDatasetCache(loader,
                               max_bytes=int(opts.get('max_bytes', 4 << 30)),
                               process_count=process_count,
                               process_index=process_index)
    return cache if cache.ok else None
