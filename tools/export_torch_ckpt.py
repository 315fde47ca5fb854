#!/usr/bin/env python3
"""Export a trained checkpoint as a reference-format torch checkpoint.

The reverse migration path: a model trained by this framework on TPU can be
served or fine-tuned by the reference torch stack unchanged — the output is
a ``torch.save`` global_state with ``model_dict`` exactly as the reference
writes them (bf/training/callbacks.py:69-73) and loads them
(bf/training/helpers.py:44-66).  Scope mirrors
``torch_import.import_reference_checkpoint``: SSD-family detectors
(backbone + Features + extras + heads) over the mobilenet/vgg backbones.

Usage:
  PYTHONPATH=/root/repo python tools/export_torch_ckpt.py \
      --config samples/ssd_mb2_voc.py \
      --checkpoint experiments/<run>/ \
      --output ssd_mb2_voc.pt

The exported state_dict strict-loads into the reference Detector and
reproduces our forward (tests/test_reference_parity.py::
test_export_strict_loads_into_reference_detector).
"""

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument('--config', required=True,
                        help='Config the checkpoint was trained with')
    parser.add_argument('--checkpoint', required=True,
                        help='ckpt-N.msgpack file or a run directory '
                             '(latest checkpoint is picked)')
    parser.add_argument('--output', required=True,
                        help='Output .pt path (reference ckpt-N.pt format)')
    parser.add_argument('--no-ema', action='store_true',
                        help='Export the live params even when the run '
                             'kept an EMA shadow')
    args = parser.parse_args()

    import jax
    try:  # weight conversion needs no accelerator
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass

    import json

    from flax import serialization

    from single_shot_detection_tpu.models import builder as model_builder
    from single_shot_detection_tpu.train import checkpoint as ckpt
    from single_shot_detection_tpu.utils import torch_import
    from single_shot_detection_tpu.utils.config import load_config

    cfg = load_config(args.config)
    model_cfg = dict(cfg.model)
    detector_cfg = dict(model_cfg.get('detector', {}))

    bundle = model_builder.build(
        base=model_cfg['base'],
        anchor_generator=model_cfg['anchor_generator'],
        input_size=tuple(cfg.input_size),
        **{k: v for k, v in detector_cfg.items()
           if k in ('num_classes', 'use_depthwise', 'features', 'extras',
                    'predictor', 'heads')})

    path = ckpt.find_latest(args.checkpoint)
    if path is None:
        sys.exit(f'no checkpoint found at {args.checkpoint}')
    # restore ONLY the model variables from the raw pytree — the export
    # needs no optimizer state, so the run's exact optimizer/scheduler/
    # accumulation chain (which shapes opt_state) never has to be rebuilt
    with open(path, 'rb') as f:
        raw = serialization.msgpack_restore(f.read())
    template = bundle.init(jax.random.PRNGKey(0))
    params = serialization.from_state_dict(template['params'],
                                           raw['params'])
    batch_stats = serialization.from_state_dict(
        template.get('batch_stats', {}), raw.get('batch_stats', {}))
    if raw.get('ema_params') and not args.no_ema:
        print('>> exporting the EMA shadow weights (--no-ema for live)')
        params = serialization.from_state_dict(template['params'],
                                               raw['ema_params'])
    variables = {'params': params, 'batch_stats': batch_stats}

    meta = {'epoch': 0, 'global_step': int(raw.get('step', 0))}
    if os.path.exists(path + '.meta.json'):
        with open(path + '.meta.json') as f:
            meta.update(json.load(f))

    torch_import.export_reference_checkpoint(
        args.output, variables,
        epoch=int(meta.get('epoch', 0)),
        global_step=int(meta.get('global_step', 0)),
        **torch_import.mapping_args_from_config(model_cfg))
    print(f'>> wrote {args.output} (reference torch checkpoint, '
          f'step {meta.get("global_step", 0)})')


if __name__ == '__main__':
    main()
