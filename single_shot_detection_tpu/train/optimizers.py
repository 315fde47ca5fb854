"""Optimizer factories (optax), matching torch/reference semantics.

Functional-parity target: reference ``bf/training/optimizers.py`` — the torch
optimizer zoo plus ``AdamW``/``SGDW`` with *decoupled* weight decay applied
**after** the step as ``p -= wd * p`` (NOT lr-scaled — optimizers.py:71-72,
116-117).  Plain ``SGD``/``Adam`` use torch's coupled decay
(``grad += wd * p``).

The optimizer is an optax ``GradientTransformation`` closed over an lr
schedule; ``lr_groups`` (per-submodule lrs, train_builder.py:12-16) map to an
``optax.multi_transform`` over path prefixes.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import optax

Schedule = Union[float, Callable[[int], float]]


def _decay_after(weight_decay: float) -> optax.GradientTransformation:
    """Post-step decoupled decay: adds ``-wd * p`` to the final updates
    (parity: optimizers.py:71-72 / :116-117)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        assert params is not None
        updates = jax.tree_util.tree_map(lambda u, p: u - weight_decay * p,
                                         updates, params)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def sgd(lr: Schedule, momentum: float = 0.0, weight_decay: float = 0.0,
        nesterov: bool = False, **_) -> optax.GradientTransformation:
    """torch.optim.SGD semantics: coupled decay before momentum."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


def sgdw(lr: Schedule, momentum: float = 0.0, weight_decay: float = 0.0,
         nesterov: bool = False, **_) -> optax.GradientTransformation:
    """Reference SGDW: momentum step, then ``p -= wd * p``."""
    parts = []
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(lr))
    if weight_decay:
        parts.append(_decay_after(weight_decay))
    return optax.chain(*parts)


def adam(lr: Schedule, betas=(0.9, 0.999), eps: float = 1e-8,
         weight_decay: float = 0.0, **_) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: coupled decay."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


def adamw(lr: Schedule, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.0, **_) -> optax.GradientTransformation:
    """Reference AdamW: adam step, then ``p -= wd * p``."""
    parts = [optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
             optax.scale_by_learning_rate(lr)]
    if weight_decay:
        parts.append(_decay_after(weight_decay))
    return optax.chain(*parts)


def rmsprop(lr: Schedule, alpha: float = 0.99, eps: float = 1e-8,
            momentum: float = 0.0, weight_decay: float = 0.0,
            **_) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_rms(decay=alpha, eps=eps))
    if momentum:
        parts.append(optax.trace(decay=momentum))
    parts.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*parts)


def adagrad(lr: Schedule, lr_decay: float = 0.0, eps: float = 1e-10,
            weight_decay: float = 0.0,
            initial_accumulator_value: float = 0.0,
            **_) -> optax.GradientTransformation:
    """torch.optim.Adagrad semantics: ``acc += g²``,
    ``p -= lr_t * g / (sqrt(acc) + eps)`` with
    ``lr_t = lr / (1 + (t-1) * lr_decay)``."""
    import jax.numpy as jnp

    def init_fn(params):
        return {'acc': jax.tree_util.tree_map(
                    lambda p: jnp.full_like(p, initial_accumulator_value),
                    params),
                'count': jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params=None):
        if weight_decay:
            updates = jax.tree_util.tree_map(lambda g, p: g + weight_decay * p,
                                             updates, params)
        acc = jax.tree_util.tree_map(lambda a, g: a + g * g,
                                     state['acc'], updates)
        count = state['count'] + 1
        base = lr(count) if callable(lr) else lr
        lr_t = base / (1.0 + (count - 1) * lr_decay)
        new_updates = jax.tree_util.tree_map(
            lambda g, a: -lr_t * g / (jnp.sqrt(a) + eps), updates, acc)
        return new_updates, {'acc': acc, 'count': count}

    return optax.GradientTransformation(init_fn, update_fn)


def adadelta(lr: Schedule, rho: float = 0.9, eps: float = 1e-6,
             weight_decay: float = 0.0, **_) -> optax.GradientTransformation:
    """torch.optim.Adadelta semantics (square-avg / acc-delta pair)."""
    import jax.numpy as jnp

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return {'square_avg': zeros(), 'acc_delta': zeros(),
                'count': jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params=None):
        if weight_decay:
            updates = jax.tree_util.tree_map(lambda g, p: g + weight_decay * p,
                                             updates, params)
        square_avg = jax.tree_util.tree_map(
            lambda s, g: rho * s + (1 - rho) * g * g,
            state['square_avg'], updates)
        delta = jax.tree_util.tree_map(
            lambda a, s, g: jnp.sqrt(a + eps) / jnp.sqrt(s + eps) * g,
            state['acc_delta'], square_avg, updates)
        acc_delta = jax.tree_util.tree_map(
            lambda a, d: rho * a + (1 - rho) * d * d,
            state['acc_delta'], delta)
        count = state['count'] + 1
        base = lr(count) if callable(lr) else lr
        new_updates = jax.tree_util.tree_map(lambda d: -base * d, delta)
        return new_updates, {'square_avg': square_avg,
                             'acc_delta': acc_delta, 'count': count}

    return optax.GradientTransformation(init_fn, update_fn)


def adamax(lr: Schedule, betas=(0.9, 0.999), eps: float = 1e-8,
           weight_decay: float = 0.0, **_) -> optax.GradientTransformation:
    """torch.optim.Adamax semantics — note torch folds eps INSIDE the max:
    ``u = max(b2 * u, |g| + eps)``."""
    import jax.numpy as jnp
    b1, b2 = betas

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return {'m': zeros(), 'u': zeros(), 'count': jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params=None):
        if weight_decay:
            updates = jax.tree_util.tree_map(lambda g, p: g + weight_decay * p,
                                             updates, params)
        m = jax.tree_util.tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                                   state['m'], updates)
        u = jax.tree_util.tree_map(
            lambda u_, g: jnp.maximum(b2 * u_, jnp.abs(g) + eps),
            state['u'], updates)
        count = state['count'] + 1
        base = lr(count) if callable(lr) else lr
        scale = base / (1.0 - b1 ** count)
        new_updates = jax.tree_util.tree_map(lambda m_, u_: -scale * m_ / u_,
                                             m, u)
        return new_updates, {'m': m, 'u': u, 'count': count}

    return optax.GradientTransformation(init_fn, update_fn)


def nadam(lr: Schedule, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.0, momentum_decay: float = 4e-3,
          **_) -> optax.GradientTransformation:
    """torch.optim.NAdam semantics (mu-product schedule from the paper)."""
    import jax.numpy as jnp
    b1, b2 = betas

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return {'m': zeros(), 'v': zeros(),
                'mu_product': jnp.ones((), jnp.float32),
                'count': jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params=None):
        if weight_decay:
            updates = jax.tree_util.tree_map(lambda g, p: g + weight_decay * p,
                                             updates, params)
        count = state['count'] + 1
        t = count.astype(jnp.float32)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (t * momentum_decay))
        mu_next = b1 * (1.0 - 0.5 * 0.96 ** ((t + 1) * momentum_decay))
        mu_product = state['mu_product'] * mu_t
        mu_product_next = mu_product * mu_next
        m = jax.tree_util.tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                                   state['m'], updates)
        v = jax.tree_util.tree_map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                                   state['v'], updates)
        base = lr(count) if callable(lr) else lr
        bc2 = 1.0 - b2 ** t

        def upd(m_, v_, g):
            denom = jnp.sqrt(v_ / bc2) + eps
            return -base * ((1.0 - mu_t) / (1.0 - mu_product) * g
                            + mu_next / (1.0 - mu_product_next) * m_) / denom

        new_updates = jax.tree_util.tree_map(upd, m, v, updates)
        return new_updates, {'m': m, 'v': v, 'mu_product': mu_product,
                             'count': count}

    return optax.GradientTransformation(init_fn, update_fn)


def radam(lr: Schedule, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.0, **_) -> optax.GradientTransformation:
    """torch.optim.RAdam semantics (rectified variance warmup)."""
    import jax.numpy as jnp
    b1, b2 = betas
    rho_inf = 2.0 / (1.0 - b2) - 1.0

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return {'m': zeros(), 'v': zeros(), 'count': jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params=None):
        if weight_decay:
            updates = jax.tree_util.tree_map(lambda g, p: g + weight_decay * p,
                                             updates, params)
        count = state['count'] + 1
        t = count.astype(jnp.float32)
        m = jax.tree_util.tree_map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                                   state['m'], updates)
        v = jax.tree_util.tree_map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                                   state['v'], updates)
        base = lr(count) if callable(lr) else lr
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        rho_t = rho_inf - 2.0 * t * (b2 ** t) / bc2
        rect = jnp.sqrt(((rho_t - 4.0) * (rho_t - 2.0) * rho_inf)
                        / jnp.maximum((rho_inf - 4.0) * (rho_inf - 2.0)
                                      * rho_t, 1e-12))
        use_rect = rho_t > 5.0

        def upd(m_, v_):
            m_hat = m_ / bc1
            adaptive = -base * rect * m_hat / (jnp.sqrt(v_ / bc2) + eps)
            plain = -base * m_hat
            return jnp.where(use_rect, adaptive, plain)

        new_updates = jax.tree_util.tree_map(upd, m, v)
        return new_updates, {'m': m, 'v': v, 'count': count}

    return optax.GradientTransformation(init_fn, update_fn)


OPTIMIZERS = {
    'SGD': sgd,
    'SGDW': sgdw,
    'Adam': adam,
    'AdamW': adamw,
    'RMSprop': rmsprop,
    'Adagrad': adagrad,
    'Adadelta': adadelta,
    'Adamax': adamax,
    'NAdam': nadam,
    'RAdam': radam,
}


def create_optimizer(optimizer_params: dict,
                     lr_schedule: Optional[Schedule] = None,
                     accumulation_steps: int = 1,
                     clip_grad_norm: Optional[float] = None
                     ) -> optax.GradientTransformation:
    """Config-driven optimizer factory (parity: train_builder.py:8-31).

    ``lr_schedule`` (built by schedulers.create_lr_schedule) overrides the
    static config lr.  ``lr_groups`` maps param-path prefixes to custom lrs
    (parity: train_builder.py:12-16 per-submodule lr groups).
    ``accumulation_steps > 1`` wraps the transformation in
    ``optax.MultiSteps`` (parity: trainer accumulation, train.py:66-85).
    ``clip_grad_norm`` (beyond parity — torch's ``clip_grad_norm_`` analog,
    config ``train.clip_grad_norm``) rescales gradients to the given global
    norm before the update; under accumulation it clips the *accumulated*
    mean gradient, matching the torch recipe of clipping right before
    ``optimizer.step()``.
    """
    params = dict(optimizer_params)
    name = params.pop('name')
    lr = lr_schedule if lr_schedule is not None else params.pop('lr')
    params.pop('lr', None)
    lr_groups = params.pop('lr_groups', None)
    factory = OPTIMIZERS[name]

    if lr_groups:
        transforms = {'__default__': factory(lr, **params)}
        for prefix, group_lr in lr_groups.items():
            transforms[prefix] = factory(group_lr, **params)

        def label_fn(tree):
            import jax

            def label_path(path):
                joined = '.'.join(str(getattr(k, 'key', k)) for k in path)
                for prefix in lr_groups:
                    if joined.startswith(prefix):
                        return prefix
                return '__default__'

            return jax.tree_util.tree_map_with_path(
                lambda path, _: label_path(path), tree)

        tx = optax.multi_transform(transforms, label_fn)
    else:
        tx = factory(lr, **params)

    if clip_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(float(clip_grad_norm)), tx)
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx
