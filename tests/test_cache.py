"""On-disk staging cache (data/cache.py + Loader(cache_dir=...)).

The cache memoizes deterministic host work (decode + staging resize), so
its single correctness contract is: batches from a cached loader are
bit-identical to an uncached one, on every epoch, in every staging
colorspace — and a stale cache is rebuilt, never served.
"""

import numpy as np
import pytest

from single_shot_detection_tpu.data.cache import StagingCache
from single_shot_detection_tpu.data.datasets import Csv, Synthetic
from single_shot_detection_tpu.data.loader import Loader, create_loaders


@pytest.fixture
def csv_dataset(tmp_path):
    """Four JPEGs of varied sizes with one box each."""
    from PIL import Image
    rng = np.random.RandomState(7)
    rows = []
    for i, (w, h) in enumerate([(100, 80), (64, 64), (120, 40), (50, 90)]):
        img = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / f'im{i}.jpg')
        rows.append(f'im{i}.jpg,{w // 4},{h // 4},{w // 2},{h // 2},1')
    (tmp_path / 'data.csv').write_text('\n'.join(rows))
    return Csv(str(tmp_path / 'data.csv'),
               labels=['background', 'thing'])


def _epoch(loader):
    return [{k: np.array(v) for k, v in batch.items()} for batch in loader]


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        for key in ('image', 'boxes', 'box_mask', 'ids'):
            np.testing.assert_array_equal(x[key], y[key], err_msg=key)


@pytest.mark.parametrize('colorspace', ['rgb', 'yuv420'])
def test_cached_loader_matches_uncached(csv_dataset, tmp_path, colorspace):
    kw = dict(batch_size=3, staging_size=(48, 32), num_workers=2,
              staging_colorspace=colorspace)
    plain = Loader(csv_dataset, **kw)
    cached = Loader(csv_dataset, cache_dir=str(tmp_path / 'cache'), **kw)

    reference = _epoch(plain)
    first = _epoch(cached)   # fills the cache
    assert cached.cache.complete
    second = _epoch(cached)  # served from the cache

    _assert_batches_equal(reference, first)
    _assert_batches_equal(reference, second)


def test_cache_persists_across_loaders(csv_dataset, tmp_path):
    kw = dict(batch_size=2, staging_size=(40, 40))
    cache_dir = str(tmp_path / 'cache')
    first = _epoch(Loader(csv_dataset, cache_dir=cache_dir, **kw))

    reopened = Loader(csv_dataset, cache_dir=cache_dir, **kw)
    assert reopened.cache.complete  # no decode needed at all
    _assert_batches_equal(first, _epoch(reopened))


def test_stale_cache_rebuilds(csv_dataset, tmp_path):
    cache_dir = str(tmp_path / 'cache')
    loader = Loader(csv_dataset, batch_size=2, staging_size=(40, 40),
                    cache_dir=cache_dir)
    _epoch(loader)
    assert loader.cache.complete

    # different staging geometry -> fingerprint mismatch -> empty rebuild
    other = Loader(csv_dataset, batch_size=2, staging_size=(48, 48),
                   cache_dir=cache_dir)
    assert other.cache.hit_count == 0
    batches = _epoch(other)
    assert other.cache.complete
    assert batches[0]['image'].shape[1:3] == (48, 48)


def test_cache_inline_dataset_and_shuffle(tmp_path):
    """Synthetic (inline images) caches too; shuffled epochs reorder but
    reuse the same records."""
    ds = Synthetic(num_images=10, image_size=32, num_classes=3, seed=5)
    kw = dict(batch_size=4, staging_size=(32, 32), shuffle=True, seed=11)
    plain = Loader(ds, **kw)
    cached = Loader(ds, cache_dir=str(tmp_path / 'c'), **kw)
    # same seed => same shuffle order per epoch in both loaders
    _assert_batches_equal(_epoch(plain), _epoch(cached))
    _assert_batches_equal(_epoch(plain), _epoch(cached))
    assert cached.cache.complete


def test_create_loaders_phase_subdirs(csv_dataset, tmp_path):
    loaders = create_loaders({'train': csv_dataset, 'eval': csv_dataset},
                             batch_size=2, staging_size=(40, 40),
                             cache_dir=str(tmp_path / 'cache'))
    assert loaders['train'].cache is not None
    assert loaders['eval'].cache is not None
    assert (loaders['train'].cache.directory
            != loaders['eval'].cache.directory)


def test_cache_get_put_roundtrip(csv_dataset, tmp_path):
    cache = StagingCache(str(tmp_path / 'c'), csv_dataset, (16, 16), 'rgb')
    assert cache.get(0) is None
    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    cache.put(0, img, (100, 80))
    rec, size = cache.get(0)
    np.testing.assert_array_equal(rec, img)
    assert size == (100, 80)
    assert not cache.complete
