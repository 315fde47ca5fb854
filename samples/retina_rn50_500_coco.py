# RetinaNet-ResNet50-500 on COCO (FPN + focal loss).
seed = 23

model = {
    'base': {'name': 'torchvision_resnet50', 'pretrained': True},
    'detector': {
        'num_classes': 80,
        'use_depthwise': False,
        'features': {'name': 'FeaturePyramid', 'out_layers': (5, 6, 7),
                     'pyramid_layers': 5, 'pyramid_channels': 256,
                     'initializer': {'name': 'normal_',
                                     'args': {'mean': 0, 'std': 0.03}}},
        'predictor': {'num_layers': 4, 'num_channels': 256, 'kernel_size': 3,
                      'activation': {'name': 'ReLU', 'args': {'inplace': True}},
                      'initializer': {'name': 'normal_',
                                      'args': {'mean': 0, 'std': 0.01}}},
        'heads': {'initializer': {'name': 'normal_', 'args': {'mean': 0, 'std': 0.01}},
                  'score_head_bias_init': -4.6},
    },
    'anchor_generator': {
        'type': 'retina_net',
        'min_level': 3,
        'max_level': 7,
        'aspect_ratios': [1.0, 2.0, 0.5],
        'scale': 4.0,
        'scales_per_level': 3,
    },
}

box_coder = {'xy_scale': 10.0, 'wh_scale': 5.0}

sampler = {'name': 'naive_sampler'}

loss = {
    'classification_loss': {'name': 'SigmoidFocalLoss', 'gamma': 2.0,
                            'alpha': 0.25},
    'localization_loss': {'name': 'SmoothL1Loss'},
    'classification_weight': 1.0,
    'localization_weight': 1.0,
}

postprocess = {
    'score_threshold': 0.01,
    'max_total': 200,
    'nms': {'max_per_class': 100, 'overlap_threshold': 0.5},
    'score_converter': 'SIGMOID',
}

target_assigner = {'matched_threshold': 0.5, 'unmatched_threshold': 0.4}

augmentations = [
    {'name': 'RandomAdjustHueSaturation',
     'args': {'max_hue_delta': 0.1, 'saturation_delta_range': (0.5, 1.5)}},
    {'name': 'ToFloat'},
    {'name': 'RandomAdjustBrightness', 'args': {'max_brightness_delta': 0.15}},
    {'name': 'RandomAdjustContrast', 'args': {'contrast_delta_range': (0.5, 1.5)}},
    {'name': 'RandomExpand',
     'args': {'aspect_ratio_range': (0.5, 2.0), 'area_range': (1.0, 16.0)}},
    {'name': 'OneOf', 'args': {'transforms': [
        {'name': 'Identity'},
        {'name': 'RandomCrop', 'args': {'min_iou': 0.0}},
        {'name': 'RandomCrop', 'args': {'min_iou': 0.1}},
        {'name': 'RandomCrop', 'args': {'min_iou': 0.3}},
        {'name': 'RandomCrop', 'args': {'min_iou': 0.5}},
        {'name': 'RandomCrop', 'args': {'min_iou': 0.7}},
        {'name': 'RandomCrop', 'args': {'min_iou': 0.9}},
    ]}},
    {'name': 'RandomHorizontalFlip'},
]

preprocessing = [
    {'name': 'ToFloatTensor', 'args': {'normalize': True}},
    {'name': 'Normalize',
     'args': {'mean': [0.485, 0.456, 0.406], 'std': [0.229, 0.224, 0.225]}},
]

input_size = (500, 500)

dataset = {
    'train': {'name': 'Coco', 'root': '{HOME}/documents/coco2017'},
    'eval': {'name': 'Coco', 'root': '{HOME}/documents/coco2017', 'val': True},
}

batch_size = 12
shuffle = True
num_workers = 3

train = {
    'accumulation_steps': 1,
    'epochs': 500,
    'eval_every': 10,
    'optimizer': {'name': 'SGD', 'lr': 1e-3, 'momentum': 0.9,
                  'weight_decay': 1e-4},
    'scheduler': {'name': 'MultiStepLR', 'milestones': [40, 80],
                  'gamma': 0.1},
}
