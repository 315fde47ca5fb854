"""Every sample config must load, interpolate, and assemble its model
(shape-only — no dataset access, no FLOPs)."""

import glob
import os

import pytest

from single_shot_detection_tpu.models import builder
from single_shot_detection_tpu.utils.config import load_config

SAMPLES = sorted(glob.glob(os.path.join(os.path.dirname(__file__),
                                        '..', 'samples', '*.py')))


@pytest.mark.parametrize('path', SAMPLES, ids=[os.path.basename(p) for p in SAMPLES])
def test_sample_config_builds(path):
    cfg = load_config(path, phases=[])  # drop dataset phases: no data on disk
    model_cfg = dict(cfg.model)
    detector_cfg = dict(model_cfg['detector'])
    bundle = builder.build(
        base=model_cfg['base'],
        anchor_generator=model_cfg['anchor_generator'],
        input_size=tuple(cfg.input_size),
        **{k: v for k, v in detector_cfg.items()
           if k in ('num_classes', 'use_depthwise', 'features', 'extras',
                    'predictor', 'heads')})
    anchors = bundle.anchors()
    assert anchors.shape[0] > 0 and anchors.shape[1] == 4
    fms = bundle.feature_map_sizes()
    assert len(fms) == len(bundle.anchor_generators)
    # loss/sampler/postprocess sections parse
    assert cfg.loss['classification_loss']['name']
    assert cfg.postprocess['score_converter'] in ('SOFTMAX', 'SIGMOID')
