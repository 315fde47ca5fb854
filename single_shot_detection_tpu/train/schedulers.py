"""Learning-rate schedules.

Functional-parity target: reference ``bf/training/schedulers.py`` (torch
scheduler zoo + ``LinearGrowthLR`` warmup, ``ConcatScheduler`` piecewise
timeline, ``CosineAnnealingWithWarmupLR``) and ``bf/builders/
train_builder.py:33-49`` (``run_each_step`` / scheduler metric wiring).

TPU-first: schedules are pure jnp functions of the optimizer step count,
compiled into the jitted train step (no host-side ``scheduler.step()``).
Per-epoch stepping (the torch default) becomes ``tick = step //
steps_per_epoch``.  ``ReduceLROnPlateau`` keeps its data-dependent host logic
(it reacts to eval metrics) and feeds the train step through the
``lr_scale`` hyperparameter in the train state.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp


def multi_step_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.1):
    """torch MultiStepLR: lr * gamma^(#milestones passed)."""
    ms = jnp.asarray(sorted(milestones))

    def schedule(tick):
        passed = jnp.sum(tick >= ms)
        return base_lr * gamma ** passed

    return schedule


def step_lr(base_lr: float, step_size: int, gamma: float = 0.1):
    def schedule(tick):
        return base_lr * gamma ** (tick // step_size)

    return schedule


def exponential_lr(base_lr: float, gamma: float):
    def schedule(tick):
        return base_lr * gamma ** tick

    return schedule


def cosine_annealing_lr(base_lr: float, T_max: int, eta_min: float = 0.0):
    T_max = max(int(T_max), 1)  # degenerate horizon (e.g. warmup == total)

    def schedule(tick):
        t = jnp.minimum(tick, T_max)
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(math.pi * t / T_max)) / 2

    return schedule


def linear_growth_lr(base_lr: float, cold_lr: float, steps: int):
    """Warmup from cold_lr to base_lr over ``steps`` ticks
    (parity: schedulers.py:5-15)."""

    def schedule(tick):
        frac = jnp.clip(tick / max(steps - 1, 1), 0.0, 1.0)
        return cold_lr + frac * (base_lr - cold_lr)

    return schedule


def concat_scheduler(base_lr: float, schedulers: Sequence):
    """Piecewise timeline of sub-schedules (parity: schedulers.py:25-57).

    ``schedulers`` entries are ``(start_tick, name, kwargs)``; each segment
    sees a tick counter restarted at its start.
    """
    segments = []
    for start, name, kwargs in schedulers:
        segments.append((start, _build(name, base_lr, kwargs)))
    segments.sort(key=lambda s: s[0])

    def schedule(tick):
        value = segments[0][1](tick - segments[0][0])
        for start, seg in segments[1:]:
            value = jnp.where(tick >= start, seg(tick - start), value)
        return value

    return schedule


def cosine_annealing_with_warmup_lr(base_lr: float, T_max: int,
                                    eta_min: float = 0.0,
                                    warmup_steps: int = 0,
                                    warmup_lr: float = 0.0):
    """LinearGrowth warmup then cosine (parity: schedulers.py:17-23)."""
    return concat_scheduler(base_lr, [
        (0, 'LinearGrowthLR', {'cold_lr': warmup_lr, 'steps': warmup_steps}),
        (warmup_steps, 'CosineAnnealingLR',
         {'T_max': T_max - warmup_steps, 'eta_min': eta_min}),
    ])


class ReduceLROnPlateau:
    """Host-side plateau controller (parity: torch ReduceLROnPlateau +
    callbacks.py:121-140).

    Call ``update(metric)`` after each eval; read ``scale`` and write it into
    the train state's ``lr_scale``.
    """

    def __init__(self, mode: str = 'min', factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 min_lr: float = 0.0, base_lr: float = 1.0, **_):
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_scale = min_lr / base_lr if base_lr else 0.0
        self.best = None
        self.num_bad = 0
        self.scale = 1.0

    def _is_better(self, metric):
        if self.best is None:
            return True
        if self.mode == 'min':
            return metric < self.best * (1 - self.threshold)
        return metric > self.best * (1 + self.threshold)

    def update(self, metric: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.num_bad = 0
        return self.scale


_FACTORIES = {
    'MultiStepLR': lambda lr, kw: multi_step_lr(lr, **kw),
    'StepLR': lambda lr, kw: step_lr(lr, **kw),
    'ExponentialLR': lambda lr, kw: exponential_lr(lr, **kw),
    'CosineAnnealingLR': lambda lr, kw: cosine_annealing_lr(lr, **kw),
    'LinearGrowthLR': lambda lr, kw: linear_growth_lr(lr, **kw),
    'ConcatScheduler': lambda lr, kw: concat_scheduler(lr, **kw),
    'CosineAnnealingWithWarmupLR': lambda lr, kw: cosine_annealing_with_warmup_lr(lr, **kw),
}


def _build(name: str, base_lr: float, kwargs: dict):
    import inspect
    factory = _FACTORIES[name]
    target = {
        'MultiStepLR': multi_step_lr, 'StepLR': step_lr,
        'ExponentialLR': exponential_lr, 'CosineAnnealingLR': cosine_annealing_lr,
        'LinearGrowthLR': linear_growth_lr, 'ConcatScheduler': concat_scheduler,
        'CosineAnnealingWithWarmupLR': cosine_annealing_with_warmup_lr,
    }[name]
    sig = inspect.signature(target)
    allowed = {k: v for k, v in kwargs.items() if k in sig.parameters}
    return factory(base_lr, allowed)


def create_lr_schedule(scheduler_params: dict, base_lr: float,
                       steps_per_epoch: int):
    """Config-driven schedule factory (parity: train_builder.py:33-49).

    Returns ``(schedule(optimizer_step) -> lr, plateau_or_none,
    scheduler_metric)``.  Schedules tick per epoch unless
    ``run_each_step`` — matching the reference's per-epoch ``scheduler.step()``.
    """
    if scheduler_params is None:
        return (lambda step: base_lr), None, None

    params = dict(scheduler_params)
    name = params.pop('name')
    run_each_step = params.pop('run_each_step', False)
    metric = params.pop('scheduler_metric', 'eval_loss')

    if name == 'ReduceLROnPlateau':
        plateau = ReduceLROnPlateau(base_lr=base_lr, **params)
        return (lambda step: base_lr), plateau, metric

    inner = _build(name, base_lr, params)

    def schedule(step):
        tick = step if run_each_step else step // max(steps_per_epoch, 1)
        return inner(tick)

    return schedule, None, metric
