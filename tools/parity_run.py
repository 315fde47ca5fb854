"""Cross-framework mAP parity: the torch reference vs this framework.

Trains BOTH frameworks on the SAME staged synthetic dataset (identical
JPEGs + annotations) with matched hyperparameters, then compares held-out
mAP scored by ONE metric implementation (ours,
``single_shot_detection_tpu.ops.metrics``), fed each framework's own
eval predictions:

  * the reference run is `/root/reference/main.py` driven as-is (torch CPU)
    with minimal import stubs for packages absent in this environment
    (torchvision -> pure-torch NMS, jpeg4py -> PIL decode, cv2 -> PIL
    resize); its eval metric call is wrapped to ALSO dump the raw
    (predictions, ground-truths) it was fed;
  * our run is `main.py --config <matched config>` on the default device.

Usage:  python tools/parity_run.py [--workdir DIR] [--epochs N] [--ours-cpu]

Writes PARITY.md at the repo root with both numbers and the delta.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

IMG = 128
TRAIN_N, EVAL_N = 96, 16
NUM_CLASSES = 5
BATCH = 8

# per-family model/detection-math sections (--family).  'ssd_mb2' mirrors
# the committed round-2 learning-evidence config; 'retina_mb1' exercises a
# disjoint code-path set cross-framework: FPN neck, SharedConvPredictor
# towers, retina anchor generator, SigmoidFocalLoss + naive sampler,
# SIGMOID score converter, config 'initializer' dicts.  Both templates are
# valid for BOTH frameworks (the config dict is the shared public API);
# backbones are the custom MobileNets because the reference's torchvision
# backbones cannot instantiate in this egress-free environment.
FAMILY_SECTIONS = {
    'ssd_mb2': """
model = {{
    'base': {{'name': 'mobilenet_v2_035'}},
    'detector': {{
        'num_classes': {num_classes},
        'use_depthwise': True,
        'features': {{'name': 'Features', 'out_layers': (13, 18)}},
        'extras': {{'layers': (('s', 128),)}},
    }},
    'anchor_generator': {{
        'type': 'ssd',
        'num_scales': 3,
        'min_scale': 0.15,
        'max_scale': 0.95,
        'aspect_ratios': [[1.0, 2.0]] * 3,
    }},
}}

sampler = {{
    'name': 'hard_negative_mining',
    'negative_per_positive_ratio': 3,
    'min_negative_per_image': 5,
}}

loss = {{
    'classification_loss': {{'name': 'CrossEntropyLoss'}},
    'localization_loss': {{'name': 'SmoothL1Loss'}},
    'classification_weight': 1.0,
    'localization_weight': 1.0,
}}

postprocess = {{
    'score_threshold': 0.1,
    'max_total': 50,
    'nms': {{'max_per_class': 20, 'overlap_threshold': 0.45}},
    'score_converter': 'SOFTMAX',
}}

target_assigner = {{'matched_threshold': 0.5, 'unmatched_threshold': 0.5}}
""",
    'm2det_mb2': """
model = {{
    'base': {{'name': 'mobilenet_v2_035'}},
    'detector': {{
        'num_classes': {num_classes},
        'features': {{'name': 'MultilevelFeaturePyramid',
                     'out_layers': (13, 18),
                     'num_scales': 3,
                     'num_tums': 2,
                     'base_reduced_channels': [64, 64],
                     'reduced_channels': 32,
                     'tum': {{'inner_channels': 64, 'out_channels': 32}}}},
    }},
    'anchor_generator': {{
        'type': 'ssd',
        'num_scales': 3,
        'min_scale': 0.15,
        'max_scale': 0.95,
        'aspect_ratios': [[1.0, 2.0]] * 3,
    }},
}}

sampler = {{
    'name': 'hard_negative_mining',
    'negative_per_positive_ratio': 3,
    'min_negative_per_image': 5,
}}

loss = {{
    'classification_loss': {{'name': 'CrossEntropyLoss'}},
    'localization_loss': {{'name': 'SmoothL1Loss'}},
    'classification_weight': 1.0,
    'localization_weight': 1.0,
}}

postprocess = {{
    'score_threshold': 0.1,
    'max_total': 50,
    'nms': {{'max_per_class': 20, 'overlap_threshold': 0.45}},
    'score_converter': 'SOFTMAX',
}}

target_assigner = {{'matched_threshold': 0.5, 'unmatched_threshold': 0.5}}
""",
    'retina_mb1': """
model = {{
    'base': {{'name': 'mobilenet_050'}},
    'detector': {{
        'num_classes': {num_classes},
        'use_depthwise': False,
        'features': {{'name': 'FeaturePyramid', 'out_layers': (5, 11, 13),
                     'pyramid_layers': 4, 'pyramid_channels': 64,
                     'initializer': {{'name': 'normal_',
                                     'args': {{'mean': 0, 'std': 0.03}}}}}},
        'predictor': {{'num_layers': 2, 'num_channels': 64, 'kernel_size': 3,
                      'activation': {{'name': 'ReLU',
                                     'args': {{'inplace': True}}}},
                      'initializer': {{'name': 'normal_',
                                      'args': {{'mean': 0, 'std': 0.01}}}}}},
        'heads': {{'initializer': {{'name': 'normal_',
                                  'args': {{'mean': 0, 'std': 0.01}}}},
                  'score_head_bias_init': -4.6}},
    }},
    'anchor_generator': {{
        'type': 'retina_net',
        'min_level': 3,
        'max_level': 6,
        'aspect_ratios': [1.0, 2.0, 0.5],
        'scale': 4.0,
        'scales_per_level': 2,
    }},
}}

sampler = {{
    'name': 'naive_sampler',
}}

loss = {{
    'classification_loss': {{'name': 'SigmoidFocalLoss', 'gamma': 2.0,
                            'alpha': 0.25}},
    'localization_loss': {{'name': 'SmoothL1Loss'}},
    'classification_weight': 1.0,
    'localization_weight': 1.0,
}}

postprocess = {{
    'score_threshold': 0.05,
    'max_total': 50,
    'nms': {{'max_per_class': 20, 'overlap_threshold': 0.5}},
    'score_converter': 'SIGMOID',
}}

target_assigner = {{'matched_threshold': 0.5, 'unmatched_threshold': 0.4}}
""",
}

# matched experiment hyperparameters.  Two augmentation chains:
#   hflip — the round-3 protocol (geometric flip only);
#   full  — the reference flagship chain MINUS RandomAdjustHueSaturation
#           (the only member that needs real OpenCV — HSV conversion;
#           brightness/contrast/expand/crop are pure numpy on the
#           reference side, bf/preprocessing/transforms.py:50-131 +
#           functional/img.py:55-113, so both frameworks run them).
AUG_CHAINS = {
    'hflip': """
augmentations = [
    {{'name': 'RandomHorizontalFlip'}},
]
""",
    'full': """
augmentations = [
    {{'name': 'ToFloat'}},
    {{'name': 'RandomAdjustBrightness', 'args': {{'max_brightness_delta': .15}}}},
    {{'name': 'RandomAdjustContrast', 'args': {{'contrast_delta_range': (.5, 1.5)}}}},
    {{'name': 'RandomExpand', 'args': {{'aspect_ratio_range': (0.5, 2.0), 'area_range': (1.0, 16.0)}}}},
    {{
        'name': 'OneOf',
        'args': {{
            'transforms': [
                {{'name': 'Identity'}},
                {{'name': 'RandomCrop', 'args': {{'min_iou': .0}}}},
                {{'name': 'RandomCrop', 'args': {{'min_iou': .1}}}},
                {{'name': 'RandomCrop', 'args': {{'min_iou': .3}}}},
                {{'name': 'RandomCrop', 'args': {{'min_iou': .5}}}},
                {{'name': 'RandomCrop', 'args': {{'min_iou': .7}}}},
                {{'name': 'RandomCrop', 'args': {{'min_iou': .9}}}},
            ]
        }}
    }},
    {{'name': 'RandomHorizontalFlip'}},
]
""",
}

COMMON_CFG = """
seed = {seed}
{family_sections}
box_coder = {{'xy_scale': 10.0, 'wh_scale': 5.0}}
{aug_chain}

preprocessing = [
    {{'name': 'ToFloatTensor', 'args': {{'normalize': True}}}},
    {{'name': 'Normalize',
     'args': {{'mean': [0.485, 0.456, 0.406], 'std': [0.229, 0.224, 0.225]}}}},
]

input_size = ({img}, {img})

dataset = {{
    'train': {{'name': 'Csv', 'path': r'{train_csv}'}},
    'eval': {{'name': 'Csv', 'path': r'{eval_csv}'}},
    'labels': {labels},
}}

batch_size = {batch}
shuffle = True
num_workers = 1

train = {{
    'accumulation_steps': 1,
    'epochs': {epochs},
    'eval_every': {eval_every},
    'max_gt': 8,
    'optimizer': {{'name': 'SGD', 'lr': {lr}, 'momentum': 0.9}},
    'scheduler': {{'name': 'MultiStepLR', 'milestones': [{milestones}],
                  'gamma': 0.1}},
}}
"""
# NB: the reference's CosineAnnealingWithWarmupLR cannot be built through its
# own config path (schedulers.py defines it via __new__ only, so
# train_builder.py:38's __init__.__code__ kwarg filter crashes) — MultiStepLR
# is the scheduler its shipped samples actually use (ssd_mb2_voc.py:119-123).

# The reference's model registry / anchor schema are intentionally
# config-compatible; the only difference between the two config files is
# the Csv name column (the reference appends '.jpg' itself, csv.py:41).

REF_DRIVER = r'''
import os
import sys
import types

import numpy as np
import torch

torch.set_num_threads(max(os.cpu_count() or 1, 1))

# the reference targets torch ~1.1: torch.jit.scope (used purely for traced
# node naming, torch_utils.py:15) is gone in modern torch — null shim
import contextlib

if not hasattr(torch.jit, 'scope'):
    torch.jit.scope = lambda *_a, **_k: contextlib.nullcontext()

# ---- stubs for packages absent in this environment ------------------------
def _torch_nms(boxes, scores, iou_threshold):
    """Pure-torch hard NMS (replaces torchvision.ops.nms for the oracle
    run; exact greedy semantics)."""
    if boxes.numel() == 0:
        return torch.zeros(0, dtype=torch.long)
    x1, y1, x2, y2 = boxes.unbind(1)
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    order = scores.argsort(descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0]
        keep.append(i.item())
        if order.numel() == 1:
            break
        rest = order[1:]
        xx1 = torch.max(x1[i], x1[rest])
        yy1 = torch.max(y1[i], y1[rest])
        xx2 = torch.min(x2[i], x2[rest])
        yy2 = torch.min(y2[i], y2[rest])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas[rest] - inter).clamp(min=1e-12)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.long)


_tv = types.ModuleType('torchvision')
_tv_models = types.ModuleType('torchvision.models')


def _unavailable(*a, **k):
    raise RuntimeError('torchvision models are not available here')


for _n in ('mobilenet_v2', 'resnet18', 'resnet34', 'resnet50', 'resnet101',
           'resnet152', 'resnext50_32x4d', 'resnext101_32x8d',
           'shufflenet_v2_x0_5', 'shufflenet_v2_x1_0', 'shufflenet_v2_x1_5',
           'shufflenet_v2_x2_0', 'vgg11', 'vgg11_bn', 'vgg13', 'vgg13_bn',
           'vgg16', 'vgg16_bn', 'vgg19', 'vgg19_bn'):
    setattr(_tv_models, _n, _unavailable)


class _NeverInstantiated:
    """Placeholder classes for base_builder's isinstance checks
    (base_builder.py:68-76) — nothing ever constructs them here."""


_tv_models.ResNet = type('ResNet', (_NeverInstantiated,), {})
_tv_models.ShuffleNetV2 = type('ShuffleNetV2', (_NeverInstantiated,), {})
_tv.models = _tv_models
_tv.ops = types.SimpleNamespace(nms=_torch_nms)
sys.modules['torchvision'] = _tv
sys.modules['torchvision.models'] = _tv_models


class _JPEG:
    def __init__(self, path):
        self.path = path

    def decode(self):
        from PIL import Image
        return np.asarray(Image.open(self.path).convert('RGB'))


_j4p = types.ModuleType('jpeg4py')
_j4p.JPEG = _JPEG
sys.modules['jpeg4py'] = _j4p

_cv2 = types.ModuleType('cv2')
_cv2.INTER_LINEAR = 1
_cv2.INTER_NEAREST = 0
_cv2.INTER_AREA = 3
_cv2.COLOR_RGB2HSV = 41
_cv2.COLOR_HSV2RGB = 55
_cv2.BORDER_CONSTANT = 0


def _cv2_resize(img, dsize, interpolation=None):
    w, h = dsize
    if img.shape[1] == w and img.shape[0] == h:
        return img.copy()
    from PIL import Image
    dtype = img.dtype
    arr = img.astype(np.float32)
    chans = [np.asarray(Image.fromarray(arr[..., c]).resize(
        (w, h), Image.BILINEAR)) for c in range(arr.shape[-1])]
    out = np.stack(chans, axis=-1)
    return out.astype(dtype)


def _cv2_absent(*a, **k):
    raise NotImplementedError('cv2 stub: only resize is implemented')


_cv2.resize = _cv2_resize
_cv2.warpAffine = _cv2_absent
_cv2.cvtColor = _cv2_absent
sys.modules['cv2'] = _cv2

sys.path.insert(0, os.environ['PARITY_REFERENCE'])

# ---- wrap the metric to dump its raw inputs --------------------------------
import detection.metrics.mean_average_precision as _refmap

_orig_map = _refmap.mean_average_precision
_dump_dir = os.environ['PARITY_DUMP_DIR']
_counter = {'n': 0}


def _dumping_map(predictions, gts, **kw):
    result = _orig_map(predictions, gts, **kw)
    payload = {'predictions': predictions.detach().cpu().numpy(),
               'result': np.float64(result)}
    for i, g in enumerate(gts):
        payload[f'gt_{i}'] = g.detach().cpu().numpy()
    np.savez(os.path.join(_dump_dir, f'eval_{_counter["n"]:03d}.npz'),
             **payload)
    _counter['n'] += 1
    return result


_refmap.mean_average_precision = _dumping_map

# ---- drive the reference main() exactly as its CLI would -------------------
import importlib.util

spec = importlib.util.spec_from_file_location(
    'ref_main', os.path.join(os.environ['PARITY_REFERENCE'], 'main.py'))
ref_main = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref_main)

from bf.training import helpers

parser = helpers.get_default_argparser()
parser.add_argument('--phases', nargs='+', default=['train', 'eval'])
parser.add_argument('--video', type=str)
parser.add_argument('--tensorboard', default=False, action='store_true')
args = parser.parse_args([
    '--config', os.environ['PARITY_REF_CONFIG'],
    '--save-dir', os.environ['PARITY_REF_SAVEDIR'],
    '--cpu',
])
ref_main.main(args)
print('REFERENCE RUN DONE')
'''


def stage_dataset(workdir):
    """Export the Synthetic dataset (data/datasets.py) as JPEGs + Csv in
    BOTH frameworks' csv dialects (ours keeps the extension; the reference
    appends '.jpg' itself and wants numeric class+score columns)."""
    from PIL import Image

    from single_shot_detection_tpu.data.datasets import Synthetic

    img_dir = os.path.join(workdir, 'data')
    os.makedirs(img_dir, exist_ok=True)
    csvs = {}
    for split, num, seed in (('train', TRAIN_N, 1), ('eval', EVAL_N, 2)):
        ds = Synthetic(num_images=num, image_size=IMG,
                       num_classes=NUM_CLASSES, max_boxes=3, seed=seed)
        ours_rows, ref_rows = [], []
        for i, ann in enumerate(ds.annotations):
            name = f'{split}_{i:04d}'
            Image.fromarray(ann['image']).save(
                os.path.join(img_dir, name + '.jpg'), quality=95)
            for b in ann['boxes']:
                x0, y0, x1, y1, cls, score = b
                ours_rows.append(f'{name}.jpg,{x0:.0f},{y0:.0f},{x1:.0f},'
                                 f'{y1:.0f},{int(cls)}')
                ref_rows.append(f'{name},{x0:.0f},{y0:.0f},{x1:.0f},'
                                f'{y1:.0f},{int(cls)},1.0')
        for flavor, rows in (('ours', ours_rows), ('ref', ref_rows)):
            path = os.path.join(img_dir, f'{split}_{flavor}.csv')
            with open(path, 'w') as f:
                f.write('\n'.join(rows) + '\n')
            csvs[(split, flavor)] = path
    return csvs


def write_configs(workdir, csvs, epochs, seed=23, milestones='100,130',
                  family='ssd_mb2', lr=2e-3, aug='hflip'):
    labels = repr(['background'] + [f'class_{i}'
                                    for i in range(1, NUM_CLASSES)])
    # splice the family/augmentation text in FIRST (they use the same
    # {{...}} escaping), then format the whole config once
    template = (COMMON_CFG
                .replace('{family_sections}', FAMILY_SECTIONS[family])
                .replace('{aug_chain}', AUG_CHAINS[aug]))
    out = {}
    for flavor in ('ours', 'ref'):
        cfg = template.format(
            num_classes=NUM_CLASSES, img=IMG, batch=BATCH, epochs=epochs,
            eval_every=epochs, labels=labels, seed=seed,
            milestones=milestones, lr=lr,
            train_csv=csvs[('train', flavor)],
            eval_csv=csvs[('eval', flavor)])
        path = os.path.join(workdir, f'config_{flavor}.py')
        with open(path, 'w') as f:
            f.write(cfg)
        out[flavor] = path
    return out


def run_reference(workdir, cfg_path):
    driver = os.path.join(workdir, 'ref_driver.py')
    with open(driver, 'w') as f:
        f.write(REF_DRIVER)
    dump_dir = os.path.join(workdir, 'ref_dumps')
    os.makedirs(dump_dir, exist_ok=True)
    env = dict(os.environ)
    env.update({
        'PARITY_REFERENCE': os.environ.get('SSD_REFERENCE_PATH',
                                           '/root/reference'),
        'PARITY_REF_CONFIG': cfg_path,
        'PARITY_REF_SAVEDIR': os.path.join(workdir, 'ref_out'),
        'PARITY_DUMP_DIR': dump_dir,
    })
    log = os.path.join(workdir, 'ref.log')
    t0 = time.time()
    with open(log, 'w') as lf:
        subprocess.run([sys.executable, driver], env=env, cwd=workdir,
                       stdout=lf, stderr=subprocess.STDOUT, check=True)
    dumps = sorted(os.listdir(dump_dir))
    assert dumps, 'reference produced no eval dumps'
    payload = np.load(os.path.join(dump_dir, dumps[-1]))
    gts = [payload[k] for k in sorted(payload.files)
           if k.startswith('gt_')]
    gts = [payload[f'gt_{i}'] for i in range(len(gts))]
    return {
        'predictions': payload['predictions'],
        'gts': gts,
        'self_reported_mAP': float(payload['result']),
        'minutes': (time.time() - t0) / 60.0,
        'log': log,
    }


def run_ours(workdir, cfg_path, cpu=False, matmul_precision=None):
    env = dict(os.environ)
    env['PYTHONPATH'] = ROOT + os.pathsep + env.get('PYTHONPATH', '')
    save = os.path.join(workdir, 'ours_out')
    log = os.path.join(workdir, 'ours.log')
    cmd = [sys.executable, os.path.join(ROOT, 'main.py'),
           '--config', cfg_path, '--save-dir', save]
    if cpu:
        cmd.append('--cpu')
    if matmul_precision:
        cmd += ['--matmul-precision', matmul_precision]
    t0 = time.time()
    with open(log, 'w') as lf:
        subprocess.run(cmd, env=env, cwd=ROOT, stdout=lf,
                       stderr=subprocess.STDOUT, check=True)
    # final eval mAP from the run's log.csv
    exp_dirs = sorted(os.listdir(save))
    csv_path = os.path.join(save, exp_dirs[-1], 'log.csv')
    import csv as csv_module
    with open(csv_path) as f:
        rows = list(csv_module.DictReader(f))
    maps = [float(r['eval_mAP']) for r in rows if r.get('eval_mAP')]
    assert maps, f'no eval_mAP in {csv_path}'
    return {'mAP': maps[-1], 'minutes': (time.time() - t0) / 60.0,
            'log': log}


def main():
    # the driver itself only stages data and scores dumps — force it onto
    # CPU so a TPU-relay outage can't kill the (CPU-only) reference run;
    # the 'ours' subprocess picks its own device (env JAX_PLATFORMS is
    # pinned by sitecustomize, so the post-import config update is the
    # reliable override)
    import jax
    jax.config.update('jax_platforms', 'cpu')

    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', default='/tmp/parity_run')
    ap.add_argument('--epochs', type=int, default=150)
    ap.add_argument('--seed', type=int, default=23)
    ap.add_argument('--train-n', type=int, default=96)
    ap.add_argument('--eval-n', type=int, default=16)
    ap.add_argument('--milestones', default='100,130')
    ap.add_argument('--family', default='ssd_mb2',
                    choices=sorted(FAMILY_SECTIONS),
                    help='model/detection-math family (retina_mb1 exercises '
                         'FPN + SharedConvPredictor + retina anchors + '
                         'focal loss cross-framework)')
    ap.add_argument('--lr', type=float, default=None,
                    help='SGD learning rate (default: 2e-3 ssd_mb2, '
                         '1e-3 retina_mb1)')
    ap.add_argument('--ours-cpu', action='store_true')
    ap.add_argument('--ours-matmul-precision', default=None,
                    choices=['default', 'high', 'highest',
                             'bfloat16', 'tensorfloat32', 'float32'],
                    help="override our side's matmul precision (the engine "
                         "defaults f32 runs to 'highest'; pass 'default' to "
                         "reproduce the pre-fix column in PARITY.md)")
    ap.add_argument('--skip-reference', action='store_true')
    ap.add_argument('--skip-ours', action='store_true')
    ap.add_argument('--aug', default='hflip', choices=sorted(AUG_CHAINS),
                    help="augmentation chain: 'hflip' (round-3 protocol) or "
                         "'full' (the reference flagship chain minus the "
                         "cv2-only HueSaturation: brightness, contrast, "
                         "expand, OneOf(crops), hflip)")
    args = ap.parse_args()

    global TRAIN_N, EVAL_N
    TRAIN_N, EVAL_N = args.train_n, args.eval_n

    os.makedirs(args.workdir, exist_ok=True)
    csvs = stage_dataset(args.workdir)
    lr = args.lr if args.lr is not None else \
        {'ssd_mb2': 2e-3, 'retina_mb1': 1e-3, 'm2det_mb2': 2e-3}[args.family]
    cfgs = write_configs(args.workdir, csvs, args.epochs, args.seed,
                         args.milestones, family=args.family, lr=lr,
                         aug=args.aug)
    print(f'staged dataset + configs under {args.workdir}', flush=True)

    results = {}
    state_path = os.path.join(args.workdir, 'results.json')
    if os.path.exists(state_path):
        results = json.load(open(state_path))

    if not args.skip_reference:
        print('training the torch reference (CPU)...', flush=True)
        ref = run_reference(args.workdir, cfgs['ref'])
        from single_shot_detection_tpu.ops.metrics import \
            mean_average_precision
        labels = {i: f'class_{i}' for i in range(1, NUM_CLASSES)}
        ref_ours_metric = mean_average_precision(
            ref['predictions'], ref['gts'], labels, iou_threshold=0.5,
            voc=False, verbose=False)
        results['reference'] = {
            'self_reported_mAP': ref['self_reported_mAP'],
            'mAP_by_our_metric': float(ref_ours_metric),
            'minutes': round(ref['minutes'], 1),
        }
        json.dump(results, open(state_path, 'w'), indent=2)
        print(json.dumps(results['reference']), flush=True)

    if not args.skip_ours:
        print('training this framework...', flush=True)
        ours = run_ours(args.workdir, cfgs['ours'], cpu=args.ours_cpu,
                        matmul_precision=args.ours_matmul_precision)
        results['ours'] = {'mAP': ours['mAP'],
                           'minutes': round(ours['minutes'], 1)}
        json.dump(results, open(state_path, 'w'), indent=2)
        print(json.dumps(results['ours']), flush=True)

    if 'reference' in results and 'ours' in results:
        delta = results['ours']['mAP'] - results['reference']['mAP_by_our_metric']
        results['delta_mAP'] = round(delta, 4)
        json.dump(results, open(state_path, 'w'), indent=2)
        print(json.dumps(results, indent=2))


if __name__ == '__main__':
    main()
