"""CLI entry point / pipeline orchestration.

Functional-parity target: reference ``main.py`` — phases train / eval / test /
export / embed over a declarative python config.

TPU-era flags replace their CUDA counterparts:
  --bf16                 replaces --amp/--amp-level (bf16 needs no loss scaling)
  --num-processes etc.   replace --distributed/--nproc/--master-port
                         (jax.distributed over ICI/DCN instead of NCCL spawn)
``--parallel`` is implicit: ``Experiment`` builds a data mesh over all local
devices (engine.py "--- mesh ---"), replicates the train state, and routes
every batch through ``shard_batch`` / ``make_array_from_process_local_data``
before the jitted step, so a single process drives all local devices and
``--num-processes`` extends the same mesh across hosts.
"""

import argparse
import logging
import sys


def get_argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', default='./config.py',
                        help='Path to a config file')
    parser.add_argument('--save-dir', type=str, default='./experiments',
                        help='Folder where checkpoints are saved')
    parser.add_argument('--checkpoint', type=str,
                        help='Checkpoint file/dir to restore from')
    parser.add_argument('--debug', default=False, action='store_true',
                        help='Disable checkpoint/log writing, verbose logs')
    parser.add_argument('--new-checkpoint', default=False, action='store_true',
                        help='Save to a fresh directory even when resuming')
    parser.add_argument('--load-weights', default=False, action='store_true',
                        help='Restore weights only (fresh optimizer state)')
    parser.add_argument('--cpu', default=False, action='store_true',
                        help='Force CPU backend')
    parser.add_argument('--bf16', default=False, action='store_true',
                        help='bfloat16 compute (TPU-native mixed precision)')
    parser.add_argument('--int8', default=False, action='store_true',
                        help='int8 PTQ serving for eval/test/export: convs '
                             'run s8xs8->s32 on the MXU, calibrated on eval '
                             'batches (the OpenVINO-deployment analog)')
    parser.add_argument('--matmul-precision', type=str, default=None,
                        choices=['default', 'high', 'highest',
                                 'bfloat16', 'tensorfloat32', 'float32'],
                        help='XLA matmul/conv precision override. Unset: '
                             'f32 runs use "highest" (true f32, matches '
                             'torch semantics), bf16 runs use "default"')
    parser.add_argument('--phases', nargs='+', default=['train', 'eval'],
                        choices=['train', 'eval', 'test', 'export', 'embed'],
                        help='One or multiple runtime phases')
    parser.add_argument('--video', type=str,
                        help='Video file or image folder for the test phase')
    parser.add_argument('--tensorboard', default=False, action='store_true',
                        help='Log to tensorboard')
    parser.add_argument('--profile', type=str, default=None, metavar='DIR',
                        help='Capture a jax.profiler device trace of the '
                             'train phase into DIR (TensorBoard-viewable)')
    parser.add_argument('--compilation-cache', type=str, default=None,
                        metavar='DIR|off',
                        help='Persistent XLA compilation cache location '
                             '(re-runs skip the minutes-long TPU compiles). '
                             'Default: on, at ~/.cache/single_shot_detection_tpu/xla; '
                             '"off" disables')

    dist = parser.add_argument_group('distributed (multi-host)')
    dist.add_argument('--coordinator-address', type=str, default=None)
    dist.add_argument('--num-processes', type=int, default=None)
    dist.add_argument('--process-id', type=int, default=None)
    return parser


def main(args):
    logging.basicConfig(
        level=logging.DEBUG if args.debug else logging.INFO,
        format='%(message)s', stream=sys.stdout, force=True)

    import os

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    else:
        # ensure a host CPU backend exists next to the accelerator (cheap
        # param init runs there; see engine.py) — some environments pin
        # JAX_PLATFORMS to the accelerator plugin only
        platforms = os.environ.get('JAX_PLATFORMS')
        if platforms and 'cpu' not in platforms:
            try:
                jax.config.update('jax_platforms', platforms + ',cpu')
            except Exception:
                pass

    from single_shot_detection_tpu.parallel import initialize_distributed
    initialize_distributed(args.coordinator_address, args.num_processes,
                           args.process_id)

    import jax
    process_count = jax.process_count()
    process_index = jax.process_index()

    from single_shot_detection_tpu.train import checkpoint as ckpt_utils
    from single_shot_detection_tpu.train.engine import Experiment
    from single_shot_detection_tpu.utils.config import load_config

    cfg = load_config(args.config, phases=args.phases)

    checkpoint_dir = ckpt_utils.prepare_checkpoint_dir(
        args.save_dir, args.checkpoint, args.config, args.debug,
        'train' in args.phases, args.new_checkpoint)

    # file logger next to the checkpoints (parity: env.py:31-36)
    if not args.debug and 'train' in args.phases and jax.process_index() == 0:
        handler = logging.FileHandler(
            __import__('os').path.join(checkpoint_dir, 'train.log'))
        handler.setFormatter(logging.Formatter('%(asctime)s %(message)s'))
        logging.getLogger().addHandler(handler)

    experiment = Experiment(cfg,
                            phases=args.phases,
                            checkpoint_dir=checkpoint_dir,
                            resume_from=args.checkpoint,
                            load_weights=args.load_weights,
                            debug=args.debug,
                            bf16=args.bf16,
                            int8=args.int8,
                            matmul_precision=args.matmul_precision,
                            compilation_cache=args.compilation_cache,
                            tensorboard=args.tensorboard,
                            process_count=process_count,
                            process_index=process_index)

    if 'embed' in args.phases:
        try:
            import IPython
            IPython.embed()
        except ImportError:
            import code
            code.interact(local={'experiment': experiment, 'cfg': cfg})
        return

    if 'train' in args.phases:
        if args.profile:
            # replaces the reference's wall-clock-only timing (train.py:64)
            # with a real device trace
            import jax.profiler
            with jax.profiler.trace(args.profile):
                experiment.train()
        else:
            experiment.train()
    elif 'eval' in args.phases:
        experiment.evaluate()

    if 'test' in args.phases:
        from single_shot_detection_tpu.utils.video_viewer import VideoViewer
        VideoViewer(args.video, experiment).run()

    if 'export' in args.phases:
        from single_shot_detection_tpu.export import export_model
        # optional config block: export = {'standalone': True, 'path': P,
        # 'batch_size': N, 'with_postprocess': ..., ...}; 'standalone'
        # bakes preprocessing + NMS + weights into one artifact
        opts = dict(experiment.cfg.export or {})
        if opts.pop('standalone', False):
            opts.setdefault('with_postprocess', True)
            opts.setdefault('with_preprocess', True)
            opts.setdefault('bake_variables', True)
        path = opts.pop('path', 'exported/model')
        int8 = bool(opts.pop('int8', False)) or args.int8
        allowed = {'with_postprocess', 'batch_size', 'with_preprocess',
                   'bake_variables'}
        unknown = sorted(set(opts) - allowed)
        if unknown:
            raise SystemExit(
                f"config export block has unknown key(s) {unknown}; "
                f"supported: {sorted(allowed | {'standalone', 'path', 'int8'})}")
        export_model(experiment, path, int8=int8, **opts)


if __name__ == '__main__':
    main(get_argparser().parse_args())
