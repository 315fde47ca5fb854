# Synthetic smoke-test config: tiny SSD on procedurally generated data.
# Runs end-to-end (train + eval + mAP) in under a minute on CPU — the
# repo-shipped answer to "the reference requires a downloaded dataset".

seed = 23

model = {
    'base': {'name': 'mobilenet_v2', 'depth_multiplier': 0.35},
    'detector': {
        'num_classes': 5,
        'use_depthwise': True,
        'features': {'name': 'Features', 'out_layers': (13, 18)},
        'extras': {'layers': (('s', 128),)},
    },
    'anchor_generator': {
        'type': 'ssd',
        'num_scales': 3,
        'min_scale': 0.15,
        'max_scale': 0.95,
        'aspect_ratios': [[1.0, 2.0]] * 3,
    },
}

box_coder = {'xy_scale': 10.0, 'wh_scale': 5.0}

sampler = {
    'name': 'hard_negative_mining',
    'negative_per_positive_ratio': 3,
    'min_negative_per_image': 5,
}

loss = {
    'classification_loss': {'name': 'CrossEntropyLoss'},
    'localization_loss': {'name': 'SmoothL1Loss'},
    'classification_weight': 1.0,
    'localization_weight': 1.0,
}

postprocess = {
    'score_threshold': 0.1,
    'max_total': 50,
    'nms': {'max_per_class': 20, 'overlap_threshold': 0.45},
    'score_converter': 'SOFTMAX',
}

target_assigner = {'matched_threshold': 0.5, 'unmatched_threshold': 0.5}

augmentations = [
    {'name': 'RandomAdjustHueSaturation',
     'args': {'max_hue_delta': 0.05, 'saturation_delta_range': (0.7, 1.3)}},
    {'name': 'RandomAdjustBrightness', 'args': {'max_brightness_delta': 0.1}},
    {'name': 'RandomExpand', 'args': {'area_range': (1.0, 4.0)}},
    {'name': 'OneOf', 'args': {'transforms': [
        {'name': 'Identity'},
        {'name': 'RandomCrop', 'args': {'min_iou': 0.3}},
        {'name': 'RandomCrop', 'args': {'min_iou': 0.7}},
    ]}},
    {'name': 'RandomHorizontalFlip'},
]

preprocessing = [
    {'name': 'ToFloatTensor', 'args': {'normalize': True}},
    {'name': 'Normalize',
     'args': {'mean': [0.485, 0.456, 0.406], 'std': [0.229, 0.224, 0.225]}},
]

input_size = (128, 128)

dataset = {
    'train': {'name': 'Synthetic', 'num_images': 96, 'image_size': 128,
              'num_classes': 5, 'max_boxes': 3, 'seed': 1},
    'eval': {'name': 'Synthetic', 'num_images': 16, 'image_size': 128,
             'num_classes': 5, 'max_boxes': 3, 'seed': 2},
}

batch_size = 8
shuffle = True
num_workers = 2

train = {
    'accumulation_steps': 1,
    'epochs': 150,
    'eval_every': 75,
    'max_gt': 8,
    'optimizer': {'name': 'SGD', 'lr': 2e-3, 'momentum': 0.9},
    'scheduler': {'name': 'CosineAnnealingWithWarmupLR', 'run_each_step': True,
                  'T_max': '{total_train_steps}', 'warmup_steps': 4,
                  'warmup_lr': 1e-4},
}
