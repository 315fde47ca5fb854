"""Batch loader: host decode/stage -> padded fixed-shape numpy batches.

Replaces the reference's torch DataLoader + worker subprocesses + collate
(data_builder.py:44-87, batch_container.py): decode and a single staging
resize happen on host threads; everything else (augmentation, normalization,
mixup) runs on-device (data/transforms.py).  Variable-length GT becomes a
padded ``[B, max_gt, R]`` array + validity mask — the fixed-shape contract the
jitted steps require.

Per-host sharding (``process_count``/``process_index``) replaces
DistributedSampler (data_builder.py:53-54).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np


def stage_image(img: np.ndarray, boxes: np.ndarray,
                size: Tuple[int, int]) -> Tuple[np.ndarray, np.ndarray]:
    """Resize to the staging size, rescaling + clipping boxes
    (parity: functional/img.py:8-17 + box.py:8-19)."""
    h, w = img.shape[:2]
    new_w, new_h = size
    if (w, h) != (new_w, new_h):
        try:
            import cv2
            img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        except ImportError:
            from PIL import Image
            img = np.asarray(Image.fromarray(img).resize((new_w, new_h),
                                                         Image.BILINEAR))
        if len(boxes):
            boxes = boxes.copy()
            boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]] * (new_w / w), 0, new_w - 1)
            boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]] * (new_h / h), 0, new_h - 1)
    return img, boxes


class Loader:
    """Iterates padded numpy batches ``{'image', 'boxes', 'box_mask', 'ids'}``.

    ``image`` is staged uint8 ``[B, S, S, 3]``; ``boxes`` ``[B, max_gt, 7]``
    (difficult column zero-filled when absent); eval keeps the original
    annotation rows for the mAP metric via ``ids``.
    """

    def __init__(self,
                 dataset,
                 batch_size: int,
                 staging_size: Tuple[int, int],
                 shuffle: bool = False,
                 drop_last: bool = False,
                 max_gt: int = 100,
                 seed: int = 23,
                 num_workers: int = 4,
                 prefetch: int = 2,
                 process_count: int = 1,
                 process_index: int = 0,
                 staging_colorspace: str = 'rgb',
                 cache_dir: Optional[str] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.staging_size = tuple(staging_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.max_gt = max_gt
        self.seed = seed
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.process_count = process_count
        self.process_index = process_index
        self.epoch = 0
        # 'yuv420': stage packed planar YUV420 (1.5 B/px — halves the
        # host->device transfer volume; the jitted step reconstructs RGB
        # on-device, transforms.yuv420_to_rgb).  Requires even staging dims.
        if staging_colorspace not in ('rgb', 'yuv420'):
            raise ValueError(f'staging_colorspace {staging_colorspace!r}: '
                             "expected 'rgb' or 'yuv420'")
        if staging_colorspace == 'yuv420' and (
                self.staging_size[0] % 2 or self.staging_size[1] % 2):
            raise ValueError('yuv420 staging needs even staging dims, got '
                             f'{self.staging_size}')
        self.staging_colorspace = staging_colorspace
        # on-disk staging cache (data/cache.py): staged pixels are a pure
        # function of (dataset, staging_size, colorspace) — decode once,
        # read at page-cache bandwidth every later epoch
        self.cache = None
        if cache_dir:
            from single_shot_detection_tpu.data.cache import StagingCache
            self.cache = StagingCache(cache_dir, dataset, self.staging_size,
                                      staging_colorspace)

    def _global_order(self) -> np.ndarray:
        """The (seed + epoch)-deterministic global permutation, wrap-padded
        to a process_count multiple.  Shared by :meth:`_indices` and the
        device cache's multi-host batch-index builder
        (data/device_cache.py) so the two can never drift."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(order)
        # equal-size per-host shards via wrap-around padding, so every
        # process emits the same number of batches — required for the
        # collective train/eval steps to agree across hosts (parity:
        # torch DistributedSampler's sample repetition)
        pad = (-n) % self.process_count
        if pad:
            order = np.concatenate([order, order[:pad]])
        return order

    def _indices(self) -> np.ndarray:
        return self._global_order()[self.process_index::self.process_count]

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    steps_per_epoch = property(__len__)

    def _native_fill(self, idxs, images) -> Optional[np.ndarray]:
        """Try the C++ batch decode+stage path (native/decode.cpp); returns
        per-image original sizes or None to fall back."""
        from single_shot_detection_tpu.data import native
        paths = []
        for i in idxs:
            ann = self.dataset.annotations[int(i)]
            path = ann.get('image_path', '')
            if not path.lower().endswith(('.jpg', '.jpeg')):
                return None
            paths.append(path)
        if self.staging_colorspace == 'yuv420':
            return native.decode_batch_into_yuv420(
                paths, images[:len(idxs)], self.staging_size,
                num_threads=self.num_workers)
        return native.decode_batch_into(paths, images[:len(idxs)],
                                        num_threads=self.num_workers)

    def _stage_one(self, i: int):
        """Python decode+stage of one sample: (staged image in the staging
        colorspace, original (w, h))."""
        from single_shot_detection_tpu.data import native
        img = self.dataset.load_image(int(i))
        h, w = img.shape[:2]
        img, _ = stage_image(img, np.zeros((0, 4), np.float32),
                             self.staging_size)
        if self.staging_colorspace == 'yuv420':
            img = native.rgb_to_yuv420(img)
        return img, (w, h)

    def _decode_rows(self, idxs, rows_out: np.ndarray,
                     pool: ThreadPoolExecutor) -> np.ndarray:
        """Decode+stage ``idxs`` into ``rows_out`` (one staging record per
        row); returns ``[k, 2]`` original (w, h) sizes.  C++ batch path when
        every source is a JPEG file, threaded python otherwise."""
        out = np.zeros((len(idxs), 2), np.int64)
        sizes = self._native_fill(idxs, rows_out)
        if sizes is not None:
            for r, i in enumerate(idxs):
                w, h = int(sizes[r, 0]), int(sizes[r, 1])
                if w == 0 or h == 0:  # native decode failed: python fallback
                    img, (w, h) = self._stage_one(int(i))
                    rows_out[r] = img
                out[r] = (w, h)
        else:
            for r, (img, wh) in enumerate(pool.map(self._stage_one, idxs)):
                rows_out[r] = img
                out[r] = wh
        return out

    def _make_batch(self, idxs: np.ndarray, pool: ThreadPoolExecutor) -> dict:
        s = self.staging_size
        n = len(idxs)

        if self.staging_colorspace == 'yuv420':
            images = np.zeros((self.batch_size, s[0] * s[1] * 3 // 2),
                              np.uint8)
        else:
            images = np.zeros((self.batch_size, s[1], s[0], 3), np.uint8)
        boxes = np.zeros((self.batch_size, self.max_gt, 7), np.float32)
        mask = np.zeros((self.batch_size, self.max_gt), bool)
        rows = images[:n]

        if self.cache is not None:
            sizes = np.zeros((n, 2), np.int64)
            miss = []
            for r, i in enumerate(idxs):
                rec = self.cache.get(int(i))
                if rec is None:
                    miss.append(r)
                else:
                    rows[r], sizes[r] = rec
            if miss:
                tmp = np.empty((len(miss),) + rows.shape[1:], np.uint8)
                miss_sizes = self._decode_rows(
                    np.asarray(idxs)[miss], tmp, pool)
                for k, r in enumerate(miss):
                    rows[r] = tmp[k]
                    sizes[r] = miss_sizes[k]
                    self.cache.put(int(idxs[r]), tmp[k],
                                   tuple(miss_sizes[k]))
        else:
            sizes = self._decode_rows(idxs, rows, pool)

        for row, i in enumerate(idxs):
            w, h = int(sizes[row, 0]), int(sizes[row, 1])
            b = self.dataset.boxes(int(i))
            if len(b):
                b = b.copy()
                b[:, [0, 2]] = np.clip(b[:, [0, 2]] * (s[0] / w),
                                       0, s[0] - 1)
                b[:, [1, 3]] = np.clip(b[:, [1, 3]] * (s[1] / h),
                                       0, s[1] - 1)
            k = min(len(b), self.max_gt)
            if k:
                boxes[row, :k, :b.shape[1]] = b[:k]
                mask[row, :k] = True

        ids = np.full((self.batch_size,), -1, np.int64)
        ids[:n] = idxs
        return {'image': images, 'boxes': boxes, 'box_mask': mask, 'ids': ids}

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        self.epoch += 1
        n_batches = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_batches)]

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            # a decode/annotation error must surface in the consumer, not
            # silently truncate the epoch: enqueue it and re-raise below
            try:
                for idxs in batches:
                    q.put(self._make_batch(idxs, pool))
                q.put(stop)
            except BaseException as exc:  # noqa: BLE001
                q.put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            pool.shutdown(wait=False)


def create_loaders(datasets: dict, batch_size: int, staging_size,
                   shuffle: bool = False, num_workers: int = 4,
                   max_gt: int = 100, seed: int = 23,
                   process_count: int = 1, process_index: int = 0,
                   staging_colorspace: str = 'rgb',
                   cache_dir: Optional[str] = None) -> dict:
    """Per-phase loaders (parity: data_builder.py:44-87 — eval batch x2,
    drop_last for train).  ``cache_dir`` enables the on-disk staging cache,
    one subdirectory per phase (train/eval datasets differ)."""
    import os
    loaders = {}
    for phase, dataset in datasets.items():
        loaders[phase] = Loader(
            dataset,
            batch_size=batch_size * 2 if phase == 'eval' else batch_size,
            staging_size=staging_size,
            shuffle=shuffle and phase == 'train',
            drop_last=phase == 'train',
            max_gt=max_gt,
            seed=seed,
            num_workers=num_workers,
            process_count=process_count,
            process_index=process_index,
            staging_colorspace=staging_colorspace,
            cache_dir=os.path.join(cache_dir, phase) if cache_dir else None)
    return loaders
