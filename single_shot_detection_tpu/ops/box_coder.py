"""SSD box encoding/decoding between centroid boxes and regression targets.

Functional-parity target: reference ``detection/box_coder.py:4-57``.  Pure
functions instead of a ScriptModule — the jitted train/eval steps close over
a ``BoxCoder`` dataclass of static floats, so XLA constant-folds the scales.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BoxCoder:
    """Centroid-offset box coder.

    ``encode``: box (centroid) + prior (centroid) -> regression target
      ``t_xy = (b_xy - p_xy) / p_wh * xy_scale``
      ``t_wh = log(b_wh / p_wh + eps) * wh_scale``
    ``decode`` is the exact inverse (without eps).

    Parity: box_coder.py:14-36 (encode, the in-place variant used by the
    training path adds eps *after* the division) and :38-57 (decode).
    """

    xy_scale: float = 10.0
    wh_scale: float = 5.0
    eps: float = 1e-8

    def encode(self, boxes: jnp.ndarray, priors: jnp.ndarray) -> jnp.ndarray:
        """boxes ``[..., A, 4]`` centroid, priors ``[A, 4]`` centroid -> ``[..., A, 4]``."""
        t_xy = (boxes[..., :2] - priors[..., :2]) / priors[..., 2:] * self.xy_scale
        t_wh = jnp.log(boxes[..., 2:] / priors[..., 2:] + self.eps) * self.wh_scale
        return jnp.concatenate([t_xy, t_wh], axis=-1)

    def decode(self, codes: jnp.ndarray, priors: jnp.ndarray) -> jnp.ndarray:
        """codes ``[..., A, 4]``, priors ``[A, 4]`` centroid -> centroid boxes."""
        xy = priors[..., :2] + priors[..., 2:] * codes[..., :2] / self.xy_scale
        wh = priors[..., 2:] * jnp.exp(codes[..., 2:] / self.wh_scale)
        return jnp.concatenate([xy, wh], axis=-1)
