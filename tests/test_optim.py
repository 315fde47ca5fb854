import numpy as np
import jax.numpy as jnp
import torch

from single_shot_detection_tpu.train import optimizers, schedulers


def run_optax(tx, param, grads):
    state = tx.init(param)
    p = param
    for g in grads:
        updates, state = tx.update(g, state, p)
        import optax
        p = optax.apply_updates(p, updates)
    return np.asarray(p)


def run_torch(opt_cls, param, grads, **kwargs):
    p = torch.nn.Parameter(torch.from_numpy(np.asarray(param)).clone())
    opt = opt_cls([p], **kwargs)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(np.asarray(g)).clone()
        opt.step()
    return p.detach().numpy()


def test_sgd_matches_torch(rng):
    param = jnp.asarray(rng.randn(7).astype(np.float32))
    grads = [jnp.asarray(rng.randn(7).astype(np.float32)) for _ in range(5)]
    tx = optimizers.create_optimizer(
        {'name': 'SGD', 'lr': 0.1, 'momentum': 0.9, 'weight_decay': 5e-4})
    got = run_optax(tx, param, grads)
    expected = run_torch(torch.optim.SGD, param, grads,
                         lr=0.1, momentum=0.9, weight_decay=5e-4)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_adam_matches_torch(rng):
    param = jnp.asarray(rng.randn(7).astype(np.float32))
    grads = [jnp.asarray(rng.randn(7).astype(np.float32)) for _ in range(5)]
    tx = optimizers.create_optimizer({'name': 'Adam', 'lr': 0.01})
    got = run_optax(tx, param, grads)
    expected = run_torch(torch.optim.Adam, param, grads, lr=0.01)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_adamw_decoupled_decay_after_step(rng):
    # reference AdamW: p_new = adam_step(p) - wd * p (optimizers.py:71-72)
    param = jnp.asarray(rng.randn(5).astype(np.float32))
    g = jnp.asarray(rng.randn(5).astype(np.float32))
    wd = 0.01
    tx_plain = optimizers.create_optimizer({'name': 'Adam', 'lr': 0.01})
    tx_w = optimizers.create_optimizer(
        {'name': 'AdamW', 'lr': 0.01, 'weight_decay': wd})
    p_plain = run_optax(tx_plain, param, [g])
    p_w = run_optax(tx_w, param, [g])
    np.testing.assert_allclose(p_w, p_plain - wd * np.asarray(param),
                               rtol=1e-5, atol=1e-7)


def test_multi_steps_accumulation(rng):
    param = jnp.asarray(rng.randn(3).astype(np.float32))
    g1 = jnp.asarray(rng.randn(3).astype(np.float32))
    g2 = jnp.asarray(rng.randn(3).astype(np.float32))
    tx = optimizers.create_optimizer({'name': 'SGD', 'lr': 0.1},
                                     accumulation_steps=2)
    state = tx.init(param)
    import optax
    u1, state = tx.update(g1, state, param)
    p_mid = optax.apply_updates(param, u1)
    np.testing.assert_allclose(np.asarray(p_mid), np.asarray(param))  # held
    u2, state = tx.update(g2, state, p_mid)
    p_end = optax.apply_updates(p_mid, u2)
    expected = np.asarray(param) - 0.1 * (np.asarray(g1) + np.asarray(g2)) / 2
    np.testing.assert_allclose(np.asarray(p_end), expected, rtol=1e-5)


def test_multi_step_lr_schedule():
    s = schedulers.multi_step_lr(1e-3, [120, 160], gamma=0.1)
    np.testing.assert_allclose(float(s(0)), 1e-3)
    np.testing.assert_allclose(float(s(119)), 1e-3)
    np.testing.assert_allclose(float(s(120)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(160)), 1e-5, rtol=1e-6)


def test_cosine_with_warmup():
    s = schedulers.cosine_annealing_with_warmup_lr(
        1.0, T_max=110, warmup_steps=10, warmup_lr=0.1)
    np.testing.assert_allclose(float(s(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(s(9)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-5)  # cosine start
    np.testing.assert_allclose(float(s(110)), 0.0, atol=1e-6)  # cosine end


def test_epoch_vs_step_schedules():
    sched, plateau, metric = schedulers.create_lr_schedule(
        {'name': 'MultiStepLR', 'milestones': [2], 'gamma': 0.1},
        base_lr=1.0, steps_per_epoch=100)
    assert plateau is None
    np.testing.assert_allclose(float(sched(199)), 1.0)
    np.testing.assert_allclose(float(sched(200)), 0.1, rtol=1e-6)


def test_plateau_controller():
    p = schedulers.ReduceLROnPlateau(patience=1, factor=0.5)
    assert p.update(1.0) == 1.0
    assert p.update(0.5) == 1.0   # improved
    assert p.update(0.6) == 1.0   # bad 1
    assert p.update(0.7) == 0.5   # bad 2 > patience -> decay


def test_lr_groups(rng):
    import jax.numpy as jnp
    params = {'backbone': {'w': jnp.ones(3)}, 'head': {'w': jnp.ones(3)}}
    grads = {'backbone': {'w': jnp.ones(3)}, 'head': {'w': jnp.ones(3)}}
    tx = optimizers.create_optimizer(
        {'name': 'SGD', 'lr': 0.1, 'lr_groups': {'head': 0.01}})
    state = tx.init(params)
    import optax
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new['backbone']['w']), 0.9, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new['head']['w']), 0.99, rtol=1e-6)


def test_plateau_scale_with_accumulation(rng):
    """lr_scale (plateau decay) multiplies the ACCUMULATED update exactly
    once per optimizer step under optax.MultiSteps (step.py:139-141):
    mid-accumulation micro-steps emit zero updates, so scaling them is a
    no-op, and the emitted update is scaled by the current factor."""
    import jax
    import optax
    params = {'w': jnp.ones(3)}
    g = {'w': jnp.full(3, 2.0)}
    tx = optimizers.create_optimizer({'name': 'SGD', 'lr': 0.1},
                                     accumulation_steps=2)
    state = tx.init(params)
    lr_scale = 0.5
    for _ in range(2):  # one accumulation window
        updates, state = tx.update(g, state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(params, updates)
    # mean grad over the window = 2.0; delta = -lr * mean_grad * scale
    np.testing.assert_allclose(np.asarray(params['w']),
                               1.0 - 0.1 * 2.0 * 0.5, rtol=1e-6)


def _torch_parity(name, torch_ctor, torch_kwargs, ours_kwargs, steps=5):
    """Run both optimizers on identical params/grads; compare trajectories."""
    import jax
    import optax
    rng = np.random.RandomState(0)
    p0 = rng.randn(7).astype(np.float32)
    grads = [rng.randn(7).astype(np.float32) for _ in range(steps)]

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch_ctor([tp], **torch_kwargs)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g.copy())
        topt.step()

    params = {'w': jnp.asarray(p0.copy())}
    tx = optimizers.create_optimizer({'name': name, **ours_kwargs})
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({'w': jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params['w']),
                               tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_adagrad_matches_torch():
    _torch_parity('Adagrad', torch.optim.Adagrad,
                  dict(lr=0.1, lr_decay=0.01, weight_decay=0.05),
                  dict(lr=0.1, lr_decay=0.01, weight_decay=0.05))


def test_adadelta_matches_torch():
    _torch_parity('Adadelta', torch.optim.Adadelta,
                  dict(lr=0.5, rho=0.9, weight_decay=0.03),
                  dict(lr=0.5, rho=0.9, weight_decay=0.03))


def test_adamax_matches_torch():
    _torch_parity('Adamax', torch.optim.Adamax,
                  dict(lr=0.01, betas=(0.9, 0.999), weight_decay=0.02),
                  dict(lr=0.01, betas=(0.9, 0.999), weight_decay=0.02))


def test_nadam_matches_torch():
    _torch_parity('NAdam', torch.optim.NAdam,
                  dict(lr=0.01, betas=(0.9, 0.999), weight_decay=0.02,
                       momentum_decay=4e-3),
                  dict(lr=0.01, betas=(0.9, 0.999), weight_decay=0.02,
                       momentum_decay=4e-3), steps=7)


def test_radam_matches_torch():
    # include steps on BOTH sides of the rho_t > 5 rectification switch
    _torch_parity('RAdam', torch.optim.RAdam,
                  dict(lr=0.01, betas=(0.9, 0.999), weight_decay=0.02),
                  dict(lr=0.01, betas=(0.9, 0.999), weight_decay=0.02),
                  steps=8)


def test_clip_grad_norm_matches_torch(rng):
    """train.clip_grad_norm reproduces torch's clip_grad_norm_ + step."""
    param = jnp.asarray(rng.randn(7).astype(np.float32))
    grads = [jnp.asarray((rng.randn(7) * 10).astype(np.float32))
             for _ in range(4)]
    tx = optimizers.create_optimizer(
        {'name': 'SGD', 'lr': 0.1, 'momentum': 0.9}, clip_grad_norm=1.0)
    got = run_optax(tx, param, grads)

    p = torch.nn.Parameter(torch.from_numpy(np.asarray(param)).clone())
    opt = torch.optim.SGD([p], lr=0.1, momentum=0.9)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(np.asarray(g)).clone()
        torch.nn.utils.clip_grad_norm_([p], 1.0)
        opt.step()
    np.testing.assert_allclose(got, p.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_clip_grad_norm_noop_below_limit(rng):
    """Gradients under the limit pass through unchanged."""
    param = jnp.asarray(rng.randn(5).astype(np.float32))
    g = jnp.asarray((rng.randn(5) * 1e-3).astype(np.float32))
    tx_plain = optimizers.create_optimizer({'name': 'SGD', 'lr': 0.1})
    tx_clip = optimizers.create_optimizer({'name': 'SGD', 'lr': 0.1},
                                          clip_grad_norm=10.0)
    np.testing.assert_allclose(run_optax(tx_clip, param, [g]),
                               run_optax(tx_plain, param, [g]),
                               rtol=1e-6, atol=1e-8)
