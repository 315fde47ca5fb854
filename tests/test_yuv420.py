"""YUV420 staging path: native decode, python fallback, loader, engine.

The yuv420 staging colorspace ships 1.5 bytes/pixel across the host->device
link (native/decode.cpp decode_batch_yuv420, data/native.rgb_to_yuv420) and
reconstructs RGB on-device inside the jitted pipeline
(data/transforms.yuv420_to_rgb).  JPEG sources are 4:2:0 internally, so the
round trip loses almost nothing beyond the source's own subsampling.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_shot_detection_tpu.data import native
from single_shot_detection_tpu.data.loader import Loader
from single_shot_detection_tpu.data.transforms import yuv420_to_rgb


def _smooth_jpegs(tmp_path, n=4, w=500, h=375, quality=90, grid=(24, 32)):
    """Band-limited photo-like JPEGs: noise on a coarse grid, upsampled.

    ``grid`` controls spatial detail — equivalence tests must keep content
    above the chroma Nyquist of their staging size (4:2:0 genuinely cannot
    represent chroma detail finer than 2px of the staged grid; that loss is
    the format, not the implementation).
    """
    from PIL import Image
    rng = np.random.RandomState(7)
    paths = []
    for i in range(n):
        small = rng.randint(0, 255, size=(*grid, 3), dtype=np.uint8)
        img = np.asarray(Image.fromarray(small).resize((w, h),
                                                       Image.BILINEAR))
        p = os.path.join(tmp_path, f'{i}.jpg')
        Image.fromarray(img).save(p, quality=quality)
        paths.append(p)
    return paths


def test_native_yuv420_matches_rgb_path(tmp_path):
    paths = _smooth_jpegs(str(tmp_path))
    if native.get_library() is None:
        pytest.skip('native decoder unavailable')
    W = H = 300
    rgb = np.zeros((len(paths), H, W, 3), np.uint8)
    s_rgb = native.decode_batch_into(paths, rgb, num_threads=2)
    yuv = np.zeros((len(paths), W * H * 3 // 2), np.uint8)
    s_yuv = native.decode_batch_into_yuv420(paths, yuv, (W, H),
                                            num_threads=2)
    assert s_rgb is not None and s_yuv is not None
    np.testing.assert_array_equal(s_rgb, s_yuv)  # same original sizes

    rec = np.asarray(yuv420_to_rgb(jnp.asarray(yuv), (W, H)))
    diff = np.abs(rec.astype(np.int16) - rgb.astype(np.int16))
    # photo-like content: tiny resampling error only (the source JPEG is
    # already 4:2:0); noise images are the pathological case and excluded
    assert diff.mean() < 2.5, diff.mean()
    assert np.percentile(diff, 99) <= 8


def test_python_fallback_roundtrip():
    rng = np.random.RandomState(11)
    from PIL import Image
    small = rng.randint(0, 255, size=(12, 16, 3), dtype=np.uint8)
    img = np.asarray(Image.fromarray(small).resize((128, 96),
                                                   Image.BILINEAR))
    packed = native.rgb_to_yuv420(img)
    assert packed.shape == (128 * 96 * 3 // 2,)
    rec = np.asarray(yuv420_to_rgb(jnp.asarray(packed[None]), (128, 96)))[0]
    diff = np.abs(rec.astype(np.int16) - img.astype(np.int16))
    assert diff.mean() < 2.5, diff.mean()


def test_grayscale_jpeg_neutral_chroma(tmp_path):
    from PIL import Image
    if native.get_library() is None:
        pytest.skip('native decoder unavailable')
    g = np.linspace(0, 255, 200 * 160).reshape(160, 200).astype(np.uint8)
    p = os.path.join(str(tmp_path), 'gray.jpg')
    Image.fromarray(g, mode='L').save(p, quality=92)
    W, H = 100, 80
    yuv = np.zeros((1, W * H * 3 // 2), np.uint8)
    sizes = native.decode_batch_into_yuv420([p], yuv, (W, H))
    assert sizes is not None and sizes[0, 0] == 200
    chroma = yuv[0, W * H:]
    np.testing.assert_array_equal(chroma, 128)
    rec = np.asarray(yuv420_to_rgb(jnp.asarray(yuv), (W, H)))[0]
    # neutral chroma -> R == G == B (within rounding)
    assert np.abs(rec.astype(np.int16) - rec[..., :1].astype(np.int16)).max() <= 1


class _JpegDataset:
    """Minimal dataset over JPEG files for Loader tests."""

    def __init__(self, paths):
        self.annotations = [{'image_path': p, 'boxes': np.zeros((1, 6),
                                                                np.float32)}
                            for p in paths]
        for ann in self.annotations:
            ann['boxes'][0] = [10, 10, 60, 60, 1, 1.0]

    def __len__(self):
        return len(self.annotations)

    def boxes(self, i):
        return self.annotations[i]['boxes']

    def load_image(self, i):
        from PIL import Image
        return np.asarray(
            Image.open(self.annotations[i]['image_path']).convert('RGB'))


def test_loader_yuv420_batches(tmp_path):
    # small staging (128x96) -> keep content above its chroma Nyquist
    paths = _smooth_jpegs(str(tmp_path), n=5, grid=(6, 8))
    ds = _JpegDataset(paths)
    rgb_loader = Loader(ds, batch_size=5, staging_size=(128, 96),
                        num_workers=2)
    yuv_loader = Loader(ds, batch_size=5, staging_size=(128, 96),
                        num_workers=2, staging_colorspace='yuv420')
    (rgb_batch,) = list(rgb_loader)
    (yuv_batch,) = list(yuv_loader)
    assert yuv_batch['image'].shape == (5, 128 * 96 * 3 // 2)
    np.testing.assert_array_equal(rgb_batch['boxes'], yuv_batch['boxes'])

    rec = np.asarray(yuv420_to_rgb(jnp.asarray(yuv_batch['image']),
                                   (128, 96)))
    diff = np.abs(rec.astype(np.int16)
                  - rgb_batch['image'].astype(np.int16))
    assert diff.mean() < 3.0, diff.mean()

    # implementation equivalence, independent of the 4:2:0 round trip:
    # native packing == python packing of the RGB-staged image (<=1 LSB)
    if native.get_library() is not None:
        packed_py = np.stack([native.rgb_to_yuv420(im)
                              for im in rgb_batch['image']])
        dpk = np.abs(packed_py.astype(np.int16)
                     - yuv_batch['image'].astype(np.int16))
        assert dpk.max() <= 1, dpk.max()


def test_loader_yuv420_validation():
    ds = _JpegDataset([])
    with pytest.raises(ValueError, match='even staging dims'):
        Loader(ds, batch_size=1, staging_size=(127, 96),
               staging_colorspace='yuv420')
    with pytest.raises(ValueError, match='staging_colorspace'):
        Loader(ds, batch_size=1, staging_size=(128, 96),
               staging_colorspace='bgr')


def test_engine_train_eval_with_yuv_staging(tmp_path):
    """staging_colorspace='yuv420' end-to-end: Synthetic (non-JPEG) data
    exercises the python packer; the jitted step reconstructs on-device."""
    from single_shot_detection_tpu.train.engine import Experiment
    from single_shot_detection_tpu.utils.config import load_config

    cfg = load_config(os.path.join(os.path.dirname(__file__), '..',
                                   'samples', 'synthetic_smoke.py'))
    cfg.config.train['epochs'] = 1
    cfg.config.train['eval_every'] = 1
    cfg.config.train['staging_colorspace'] = 'yuv420'
    cfg.config.dataset['train']['num_images'] = 16
    cfg.config.dataset['eval']['num_images'] = 8
    exp = Experiment(cfg, phases=['train', 'eval'], debug=True)
    rows = exp.train()
    assert np.isfinite(rows[-1]['train_loss'])
    assert 'eval_mAP' in rows[-1]


def test_yuv_packed_batch_shards_on_mesh(rng):
    """Packed [B, N] YUV staging batches shard over the data mesh and the
    in-step reconstruction + pipeline + train step agree with the
    single-device run (loss-level)."""
    if jax.device_count() < 8:
        pytest.skip('needs the 8-device CPU mesh')
    from single_shot_detection_tpu.data.transforms import Pipeline
    from single_shot_detection_tpu.models import builder
    from single_shot_detection_tpu.ops import losses, matching, sampling
    from single_shot_detection_tpu.ops.box_coder import BoxCoder
    from single_shot_detection_tpu.parallel import (create_mesh, replicated,
                                                    shard_batch)
    from single_shot_detection_tpu.train import (create_train_state,
                                                 make_train_step, optimizers)

    IMG = 64
    bundle = builder.build(
        base={'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
        anchor_generator={'type': 'ssd', 'num_scales': 1, 'min_scale': 0.3,
                          'max_scale': 0.9, 'aspect_ratios': [[1.0]]},
        num_classes=3,
        features={'name': 'Features', 'out_layers': (18,)},
        input_size=(IMG, IMG))
    anchors = bundle.anchors()
    coder = BoxCoder(10.0, 5.0)
    criterion = losses.MultiboxLoss(sampling.naive_sampler, coder,
                                    {'name': 'CrossEntropyLoss'},
                                    {'name': 'SmoothL1Loss'})
    assigner = matching.TargetAssigner(0.5)
    tx = optimizers.create_optimizer({'name': 'SGD', 'lr': 1e-2})
    state = create_train_state(bundle.init(jax.random.PRNGKey(0), 8), tx)

    pipeline = Pipeline((), [{'name': 'ToFloatTensor',
                              'args': {'normalize': True}}],
                        (IMG, IMG), train=True, staging_yuv=(IMG, IMG))
    rgb = (rng.rand(8, IMG, IMG, 3) * 255).astype(np.uint8)
    packed = np.stack([native.rgb_to_yuv420(im) for im in rgb])
    batch_np = {
        'image': packed,
        'boxes': np.tile(np.array([10, 10, 40, 40, 1, 1, 0], np.float32),
                         (8, 2, 1)),
        'box_mask': np.ones((8, 2), bool),
    }
    step = make_train_step(bundle.module, criterion, assigner, anchors, tx,
                           pipeline=pipeline, donate=False)

    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, metrics1 = step(state, batch1, jax.random.PRNGKey(1))

    mesh = create_mesh()
    state_sh = jax.device_put(state, replicated(mesh))
    batch8 = shard_batch(mesh, batch_np)
    assert batch8['image'].sharding.spec[0] == 'data'
    assert batch8['image'].ndim == 2  # packed layout shards on batch only
    _, metrics8 = step(state_sh, batch8, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics8['loss']),
                               float(metrics1['loss']), rtol=1e-4)
