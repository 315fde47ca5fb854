"""Native C++ decode/staging library (skipped when toolchain unavailable)."""

import os
import tempfile

import numpy as np
import pytest

from single_shot_detection_tpu.data import native


@pytest.fixture(scope='module')
def jpegs(tmp_path_factory):
    from PIL import Image
    rng = np.random.RandomState(0)
    tmp = tmp_path_factory.mktemp('jpegs')
    paths = []
    imgs = []
    for i in range(4):
        img = rng.randint(0, 255, (48, 64, 3), np.uint8)
        p = str(tmp / f'{i}.jpg')
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
        imgs.append(np.asarray(Image.open(p).convert('RGB')))
    return paths, imgs


def test_native_batch_decode(jpegs):
    if native.get_library() is None:
        pytest.skip('native library unavailable')
    paths, imgs = jpegs
    out = np.zeros((4, 32, 32, 3), np.uint8)
    sizes = native.decode_batch_into(paths, out, num_threads=2,
                                     fast_scale=False)
    assert sizes is not None
    assert (sizes == [64, 48]).all()
    # staged content matches cv2's point-sampled bilinear closely
    # (PIL's BILINEAR antialiases on downsample, so compare against cv2)
    import cv2
    ref = cv2.resize(imgs[0], (32, 32), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(out[0].astype(int) - ref.astype(int)).mean()
    assert diff < 2.0


def test_native_fast_scale_decode(jpegs, tmp_path):
    """DCT-scaled decode: same original sizes reported, near-identical
    content on smooth images (the low-pass only diverges on per-pixel
    noise)."""
    if native.get_library() is None:
        pytest.skip('native library unavailable')
    from PIL import Image
    yy, xx = np.mgrid[0:48, 0:64]
    smooth = np.stack([xx * 2, yy * 3, (xx + yy)], -1).astype(np.uint8)
    p = str(tmp_path / 'smooth.jpg')
    Image.fromarray(smooth).save(p, quality=95)

    # 64x48 -> 16x12 exercises the 1/4 DCT scale
    full = np.zeros((1, 12, 16, 3), np.uint8)
    fast = np.zeros((1, 12, 16, 3), np.uint8)
    s1 = native.decode_batch_into([p], full, fast_scale=False)
    s2 = native.decode_batch_into([p], fast, fast_scale=True)
    np.testing.assert_array_equal(s1, s2)  # original dims for box rescale
    assert (s2 == [64, 48]).all()
    diff = np.abs(full[0].astype(int) - fast[0].astype(int)).mean()
    assert diff < 8.0


def test_native_failure_marks_slot(jpegs, tmp_path):
    if native.get_library() is None:
        pytest.skip('native library unavailable')
    paths, _ = jpegs
    bad = str(tmp_path / 'missing.jpg')
    out = np.zeros((2, 32, 32, 3), np.uint8)
    sizes = native.decode_batch_into([paths[0], bad], out)
    assert sizes[0, 0] == 64 and sizes[1, 0] == 0


def test_loader_uses_native_for_jpeg_datasets(jpegs):
    if native.get_library() is None:
        pytest.skip('native library unavailable')
    paths, imgs = jpegs
    from single_shot_detection_tpu.data.datasets import DetectionDataset
    from single_shot_detection_tpu.data.loader import Loader

    class Tiny(DetectionDataset):
        class_labels = ('background', 'a')

        def __init__(self):
            self.annotations = [
                {'image_path': p,
                 'boxes': np.array([[4, 4, 40, 40, 1, 1.0]], np.float32)}
                for p in paths]

    loader = Loader(Tiny(), batch_size=4, staging_size=(32, 32), num_workers=1)
    batch = next(iter(loader))
    assert batch['image'].std() > 5
    # boxes rescaled from 64x48 to 32x32
    np.testing.assert_allclose(batch['boxes'][0, 0, 0], 4 * 32 / 64)
    np.testing.assert_allclose(batch['boxes'][0, 0, 1], 4 * 32 / 48)
