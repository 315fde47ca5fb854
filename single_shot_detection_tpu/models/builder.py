"""Config -> detector assembly.

Functional-parity targets: reference ``detection/detector_builder.py:12-55``
(``build``), ``bf/builders/base_builder.py:59-86`` (``create_base``) and the
anchor wiring in ``detection/detector.py:82-96``.

TPU-first: instead of generating anchors from live feature maps in the
forward pass, the builder probes static per-scale shapes once with
``jax.eval_shape`` (zero FLOPs) and bakes the anchors as a numpy constant the
jitted steps close over.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from single_shot_detection_tpu.models import backbones
from single_shot_detection_tpu.models.detector import Detector
from single_shot_detection_tpu.models.features import NECKS
from single_shot_detection_tpu.ops import anchors as anchor_ops


@dataclasses.dataclass
class DetectorBundle:
    """Assembled model + anchor machinery.

    ``module`` is the flax Detector; ``anchors(img_size)`` returns the flat
    ``[A, 4]`` centroid priors for a static input size (cached).
    """

    module: Detector
    anchor_generators: list
    input_size: Tuple[int, int]  # (w, h)
    num_classes: int

    _anchor_cache: dict = dataclasses.field(default_factory=dict)
    _fm_cache: dict = dataclasses.field(default_factory=dict)

    def feature_map_sizes(self, img_size: Optional[Tuple[int, int]] = None):
        """Per-scale (w, h) feature map sizes via shape-only evaluation."""
        img_size = tuple(img_size or self.input_size)
        if img_size not in self._fm_cache:
            w, h = img_size
            dummy = jnp.zeros((1, h, w, 3), jnp.float32)
            out, _ = jax.eval_shape(
                lambda: self.module.init_with_output(
                    jax.random.PRNGKey(0), dummy, return_sources=True))
            sources = out[2]
            self._fm_cache[img_size] = [(s.shape[2], s.shape[1]) for s in sources]
        return self._fm_cache[img_size]

    def anchors(self, img_size: Optional[Tuple[int, int]] = None) -> np.ndarray:
        img_size = tuple(img_size or self.input_size)
        if img_size not in self._anchor_cache:
            fms = self.feature_map_sizes(img_size)
            self._anchor_cache[img_size] = anchor_ops.generate_anchors(
                self.anchor_generators, img_size, fms)
        return self._anchor_cache[img_size]

    def init(self, rng, batch_size: int = 1,
             img_size: Optional[Tuple[int, int]] = None):
        """Initialize model variables ({'params', 'batch_stats'})."""
        w, h = tuple(img_size or self.input_size)
        dummy = jnp.zeros((batch_size, h, w, 3), jnp.float32)
        return self.module.init(rng, dummy, train=False)


def _torchhub_cache_dirs(hub_dir=None):
    import os
    if hub_dir:
        return [str(hub_dir)]
    dirs = []
    if os.environ.get('TORCH_HOME'):
        dirs.append(os.path.join(os.environ['TORCH_HOME'], 'hub'))
    dirs.append(os.path.expanduser('~/.cache/torch/hub'))
    return dirs


def resolve_torchhub(name: str, hub_dir=None) -> Tuple[str, Optional[str]]:
    """Resolve a ``torchhub://repo:model`` backbone OFFLINE.

    The reference downloaded arbitrary torch-hub modules at runtime
    (base_builder.py:60-63); a TPU/flax build has no torch-module runtime
    (and typically no egress), so the supported subset is: ``model`` names
    a REGISTRY backbone, and its pretrained weights — if any — come from a
    local torch-hub cache (``base.hub_dir`` > ``$TORCH_HOME/hub`` >
    ``~/.cache/torch/hub``), whose ``checkpoints/`` dir is searched for a
    ``<model>*.pth`` state_dict (torch hub's own download layout).

    Returns ``(registry_name, weight_path_or_None)``; raises with the
    recipe when the model is not a registry backbone.
    """
    import os
    spec = name[len('torchhub://'):]
    model = spec.rsplit(':', 1)[-1].strip()
    if model not in backbones.available():
        raise ValueError(
            f'{name!r}: torch-hub modules cannot run on a flax/TPU build; '
            f'only registry backbones can be resolved offline '
            f'({", ".join(backbones.available()[:6])}, ...). Either use a '
            f'registry name directly, or load torch weights from a file '
            f"via base={{'weight': 'state_dict.pt'}} "
            f'(utils/torch_import.py).')
    weight = None
    for d in _torchhub_cache_dirs(hub_dir):
        ckpt_dir = os.path.join(d, 'checkpoints')
        if not os.path.isdir(ckpt_dir):
            continue
        hits = sorted(f for f in os.listdir(ckpt_dir)
                      if f.startswith(model) and f.endswith(('.pth', '.pt')))
        if hits:
            weight = os.path.join(ckpt_dir, hits[0])
            break
    return model, weight


def create_base(name: str, axis_name=None, dtype=jnp.float32, **kwargs):
    """Instantiate a backbone by registry name (parity: base_builder.py:59-86).

    ``pretrained``/``weight`` handling happens at the train-state level via
    the torch-weight importer (utils/torch_import.py), not here — flax
    modules are stateless.  ``torchhub://repo:model`` resolves offline to a
    registry backbone + local hub-cache weights (:func:`resolve_torchhub`).
    """
    if name.startswith('torchhub://'):
        name, _ = resolve_torchhub(name, kwargs.pop('hub_dir', None))
    else:
        kwargs.pop('hub_dir', None)
    factory = backbones.get(name)
    return factory(axis_name=axis_name, dtype=dtype, **kwargs)


def build(base: dict,
          anchor_generator: dict,
          num_classes: int,
          features: dict,
          use_depthwise: bool = False,
          extras: Optional[dict] = None,
          predictor: Optional[dict] = None,
          heads: Optional[dict] = None,
          input_size: Tuple[int, int] = (300, 300),
          axis_name: Optional[str] = None,
          dtype: Any = jnp.float32) -> DetectorBundle:
    """Assemble Features -> anchors -> extras -> predictor -> heads -> Detector
    (parity: detector_builder.py:12-55 + init.py:47-50)."""
    extras = extras or {}
    heads = heads or {}
    extra_layers = tuple(tuple(l) for l in extras.get('layers', ()))

    base_module = create_base(base['name'], axis_name=axis_name, dtype=dtype,
                              **{k: v for k, v in base.items()
                                 if k not in ('name', 'pretrained', 'weight')})

    features_cfg = dict(features)
    neck_name = features_cfg.pop('name')
    Neck = NECKS[neck_name]
    neck_kwargs = {k: v for k, v in features_cfg.items()
                   if k in Neck.__dataclass_fields__}
    if 'use_depthwise' in Neck.__dataclass_fields__:
        neck_kwargs.setdefault('use_depthwise', use_depthwise)
    if 'axis_name' in Neck.__dataclass_fields__:
        neck_kwargs['axis_name'] = axis_name
    if 'dtype' in Neck.__dataclass_fields__:
        neck_kwargs['dtype'] = dtype
    neck = Neck(base=base_module, **neck_kwargs)

    if neck_name == 'Features':
        num_neck_outputs = len(features_cfg['out_layers'])
    elif neck_name in ('FeaturePyramid', 'DepthwiseFeaturePyramid'):
        num_neck_outputs = features_cfg['pyramid_layers']
    else:  # MultilevelFeaturePyramid
        num_neck_outputs = features_cfg['num_scales']
    num_scales = num_neck_outputs + len(extra_layers)

    generators = anchor_ops.build_anchor_generators(**anchor_generator)
    assert num_scales == len(generators), \
        f'{num_scales} scales vs {len(generators)} anchor generators'
    num_boxes = tuple(g.num_boxes for g in generators)

    head_dtype = heads.get('dtype')
    if isinstance(head_dtype, str):
        head_dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16,
                      'float16': jnp.float16}[head_dtype]

    module = Detector(features=neck,
                      num_classes=num_classes,
                      extras=extra_layers,
                      num_boxes=num_boxes,
                      use_depthwise=use_depthwise,
                      predictor=dict(predictor) if predictor else None,
                      score_head_bias_init=heads.get('score_head_bias_init', 0.0),
                      extras_initializer=extras.get('initializer'),
                      head_initializer=heads.get('initializer'),
                      axis_name=axis_name,
                      dtype=dtype,
                      head_dtype=head_dtype)

    return DetectorBundle(module=module,
                          anchor_generators=generators,
                          input_size=tuple(input_size),
                          num_classes=num_classes)
